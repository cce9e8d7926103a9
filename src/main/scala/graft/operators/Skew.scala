package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large equi-joins on hot keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; this explicit
  * salted join is for the cases it can't reach (stream-static joins,
  * AQE-off deployments, or when the skew is known up front): the skewed
  * side spreads each key over `buckets` salt values, the other side
  * replicates each row `buckets`× with one salt each, and the join keys on
  * (key, salt) — a hot key's rows now land on `buckets` reducers instead
  * of one. Result multiplicity is exactly that of the plain join: each
  * skewed-side row matches precisely the one replica carrying its salt.
  *
  * Cost: `buckets`× blow-up of the replicated side's shuffle volume — use
  * single-digit bucket counts and put the SMALLER side on `replicated`.
  */
object Skew {

  def saltedJoin(
      skewed: DataFrame, replicated: DataFrame,
      key: String, buckets: Int = 8): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    // the salt must be DETERMINISTIC per row: monotonically_increasing_id
    // depends on partition layout, so a stage retry could re-salt rows
    // differently than the copies already fetched by reducers — losing or
    // duplicating join output. Hashing the row's own columns is stable
    // across retries and spreads a hot key uniformly — with one caveat:
    // byte-identical duplicate rows share a salt, so a hot key made of
    // EXACT duplicates stays in one bucket (output still correct, skew
    // unmitigated). If duplicates are expected, pre-assign a stable row
    // discriminator (e.g. a persisted row index) and include it here.
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*),
        lit(buckets.toLong)).cast("int"))
    val r = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
