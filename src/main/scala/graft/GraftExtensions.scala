package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft._

/**
 * SparkSessionExtensions entry point: makes graft's custom expressions
 * available to pure-SQL users without any Scala import —
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions). ...
 * // or: --conf spark.sql.extensions=graft.GraftExtensions
 * spark.sql("SELECT sip_hash_64(text), char_ngrams(text, 3) FROM docs")
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String)(builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name), builder))

    inject("int_hash_64")(es => IntHash64(es.head))
    inject("sip_hash_64")(es => SipHash64(es.head))
    inject("sim_hash_64")(es => SimHash64(es.head))
    inject("bit_hamming_distance")(es => BitHammingDistance(es(0), es(1)))
    inject("byte_hamming_distance")(es => ByteHammingDistance(es(0), es(1)))
    inject("cosine_distance")(es => CosineDistance(es(0), es(1)))
    inject("euclidean_distance")(es => EuclideanDistance(es(0), es(1)))
    inject("dot_product")(es => DotProduct(es(0), es(1)))
    inject("vector_norm")(es => VectorNorm(es.head))
    inject("char_ngrams") { es =>
      CharNgrams(es(0), es(1).eval().asInstanceOf[Number].intValue())
    }
    inject("minhash_signature") { es =>
      MinHashSignature(es(0),
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue())
    }
    inject("heavy_hitters") { es =>
      MisraGriesTopK(es(0),
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()
    }
    inject("jl_project") { es =>
      JlProject(es(0), es(1).eval().asInstanceOf[Number].intValue())
    }
    inject("image_header_dims")(es => ImageHeaderDims(es.head))
    inject("topk_rows") { es =>
      TopKRows(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()
    }
    inject("kll_quantiles") { es =>
      val probs = es(1).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq
      KllQuantiles(es(0), probs,
        es(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()
    }
    inject("kll_quantiles_weighted") { es =>
      val probs = es(2).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq
      KllQuantilesWeighted(es(0), es(1), probs,
        es(3).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()
    }
  }
}
