package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE / CDC apply: fold a change set into a target snapshot —
  * the operation every warehouse-table maintenance loop runs (Delta
  * MERGE, Hudi upsert, Iceberg merge-into), expressed as one declarative
  * full-outer join Catalyst can plan freely.
  *
  * Semantics ([[applyChanges]]): a change row is (key columns, data
  * columns, op) with op ∈ {upsert, delete}:
  *  - matched + upsert  → target row replaced by the change's data;
  *  - matched + delete  → target row dropped;
  *  - unmatched upsert  → inserted;
  *  - unmatched delete  → no-op (idempotent replay of a past delete);
  *  - target rows with no change → kept verbatim.
  *
  * Determinism contract: at most ONE change per key — the caller owns
  * collapsing a CDC stream first ("latest per key" is exactly q47's
  * operator). With duplicate change keys the join fans out and the
  * result depends on nothing the engine promises.
  *
  * Scale: ONE equi-join on the key columns; output is a full new
  * snapshot (copy-on-write). Spark cannot broadcast a FULL OUTER join
  * (no build side can be the stream side for unmatched-row emission), so
  * both inputs shuffle — which is why the practical 100 TB deployment
  * partitions the snapshot by a key-derived column and rewrites ONLY the
  * partitions the change set touches ([[graft.sources.Partitioned]] owns
  * layout): the per-partition fold is this same operator over
  * partition-sized inputs, and the untouched bulk never moves.
  *
  * Matching is strict equality: NULL keys never match (SQL MERGE
  * semantics) — a NULL-keyed target row is always kept, a NULL-keyed
  * upsert always inserts.
  */
object Merge {

  /** Apply `changes` to `target`. `changes` must carry every target
    * column plus `opCol` (values "upsert" | "delete").
    *
    * @return the merged snapshot, target's columns in target's order */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val missing = (target.columns :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing columns: ${missing.mkString(", ")}")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    // Rename change-side data columns so the USING join leaves exactly
    // one unambiguous column per name (USING coalesces the keys itself).
    // The op value is validated PER ROW as it is read: an unrecognized op
    // ('DELETE', 'remove', a typo) must fail the job loudly — silently
    // treating it as an upsert (or skipping it) corrupts the snapshot.
    val validatedOp = when(col(opCol).isin("upsert", "delete"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"merge: unknown $opCol value '"),
        coalesce(col(opCol), lit("<null>")),
        lit("' (expected upsert|delete)"))))
    val ch = changes.select(
      keys.map(col) ++
        dataCols.map(c => col(c).as(s"__ch_$c")) :+
        validatedOp.as("__op"): _*)
    target.join(ch, keys, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "delete")
      .select(target.columns.toSeq.map { c =>
        if (keys.contains(c)) col(c)
        else when(col("__op").isNotNull, col(s"__ch_$c")).otherwise(col(c))
          .as(c)
      }: _*)
  }
}
