package graft.core

import java.security.MessageDigest

/**
 * Lineage op-tree: a canonical, content-hashable record of the chain of
 * operations that produced a DataFrame. The reference hashes each step
 * (`Step.hash`, reference: src/datachain/query/dataset.py:164-174) and the
 * whole chain (`DataChain.hash`, src/datachain/lib/dc/datachain.py:219) to
 * drive checkpoints and delta recompute. We do the same over our own op
 * descriptors — NOT over Catalyst plans, whose string form is not stable
 * across Spark versions/sessions.
 */
final case class Op(name: String, args: Seq[String])

final case class OpTree(ops: Vector[Op], parents: Vector[String] = Vector.empty) {
  def append(name: String, args: String*): OpTree = copy(ops = ops :+ Op(name, args))
  def withParent(parentHash: String): OpTree = copy(parents = parents :+ parentHash)

  /** Stable content hash of the whole tree (hex sha-256). */
  lazy val hash: String = {
    val md = MessageDigest.getInstance("SHA-256")
    parents.foreach(p => md.update(p.getBytes("UTF-8")))
    ops.foreach { op =>
      md.update(op.name.getBytes("UTF-8"))
      md.update(0.toByte)
      op.args.foreach { a => md.update(a.getBytes("UTF-8")); md.update(1.toByte) }
      md.update(2.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }
}

object OpTree {
  val empty: OpTree = OpTree(Vector.empty)
}
