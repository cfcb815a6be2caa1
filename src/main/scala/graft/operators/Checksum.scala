package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Order-independent dataset fingerprinting: a constant-size integrity
  * stamp for a corpus (or each partition of one) that any engine, any
  * row order, and any cluster layout reproduces bit-for-bit — the cheap
  * answer to "is the copy I trained on the copy you audited?" at 100 TB.
  *
  * Each row folds to one FNV-1a64 of its canonical serialization
  * (field values joined with an unambiguous separator), and rows combine
  * with COMMUTATIVE aggregates only — count, XOR of the row hashes, and
  * a bounded additive digest — so the stamp is invariant to partitioning
  * and shuffle order by construction (no sort, no collect, no canonical
  * row ordering ever needed). One partial-agg shuffle of (group, 3
  * longs); the corpus is scanned exactly once.
  *
  * XOR alone is blind to duplicated-row PAIRS (x ⊕ x = 0); the additive
  * digest (sum of hash mod 2³⁰ — a power of two so signed-JVM and
  * unsigned-HUGEINT residues agree, exact in BIGINT up to ~8·10⁹ rows
  * per group) catches exactly that class, and count pins cardinality.
  * All three are integers, so the gate oracle (p14) mirrors them
  * exactly.
  */
object Checksum {

  /** Canonical row serialization: values joined by 0x1F (ASCII unit
    * separator — cannot collide with text content more cheaply than
    * full escaping, and the fixture corpus is ASCII-printable). NULL
    * renders as the empty string, distinguished from "" by the caller
    * including a presence column if the distinction matters. */
  def canonicalRow(cols: Seq[Column]): Column =
    concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit(""))): _*)

  /** Per-group integrity stamp over the given columns:
    * (groupCol, n_rows, xor_fp, add_fp). */
  def datasetChecksum(df: DataFrame, groupCol: String,
      cols: Seq[String]): DataFrame = {
    val h = TextExpressions.fnv1a64(canonicalRow(cols.map(col)))
    df.select(col(groupCol), h.as("__h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_fp"),
        sum(col("__h").bitwiseAND(lit((1L << 30) - 1))).as("add_fp"))
  }
}
