package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TopKFreq.topkFreq
import graft.ops.Hashing._

/** Operational skew diagnostics -- the "do I need to salt this key?"
  * tooling that pairs with the engine's salted joins. Everything here
  * is one bounded-state pass over the data; nothing collects more
  * than the report itself to the driver.
  */
object DiagnosticsOps {

  /** The k heaviest values of a prospective join/agg key, each with
    * its frequency and share of total rows. One map-side-combinable
    * SpaceSaving pass over the hashed key (bounded sketch state,
    * exact while distinct keys <= capacity, frequency upper bounds
    * beyond that), then one broadcast-filtered pass recovers the
    * readable key values for just the top k hashes.
    *
    * A top share near 1/partitions is harmless; a single key holding
    * tens of percent is the signal to salt (see the LSH joins' salt
    * discipline) or pre-aggregate. */
  def keySkew(df: DataFrame, key: Column, k: Int = 20,
      capacity: Int = 4096): DataFrame = {
    // deliberately NOT materialized: the projection is 2 narrow
    // columns, and two pushed-down scans beat checkpointing the whole
    // keyed stream at any real size
    val keyed = df.select(key.cast("string").as("key_value"))
      .withColumn("kh", h15(col("key_value")))
    val sk = keyed.agg(topkFreq(col("kh"), k, capacity).as("top"),
      count(lit(1)).as("n_rows"))
    val top = sk
      .select(posexplode(col("top")).as(Seq("idx", "entry")), col("n_rows"))
      .select((col("idx") + 1).cast("int").as("rank"),
        col("entry.item").as("kh"), col("entry.cnt").as("freq"),
        col("n_rows"))
    val names = keyed
      .join(broadcast(top.select(col("kh"))), Seq("kh"), "left_semi")
      .distinct()
    top.join(broadcast(names), Seq("kh"))
      .select(col("rank"), col("key_value"), col("freq"),
        round(col("freq").cast("double") / col("n_rows"), 4).as("share"))
  }

  /** Physical partition balance of a DataFrame as it would execute:
    * rows per partition plus the max/mean imbalance ratio -- the
    * straggler early-warning. One narrow pass; partition ids are an
    * execution property, so this is a diagnostic, not an oracle-able
    * query. */
  def partitionBalance(df: DataFrame): DataFrame = {
    val per = df.select(spark_partition_id().as("partition_id"))
      .groupBy(col("partition_id")).agg(count(lit(1)).as("n_rows"))
    per.crossJoin(broadcast(
        per.agg(max(col("n_rows")).as("mx"),
          avg(col("n_rows")).as("mean"))))
      .select(col("partition_id"), col("n_rows"),
        round(col("mx") / col("mean"), 2).as("max_over_mean"))
  }

  /** Oracle-gated binding: heaviest user_ids in the events stream
    * (distinct users << capacity, so the sketch is exact and
    * hash-matches the DuckDB group-by twin). */
  def diagKeySkew(s: SparkSession, dir: String): DataFrame =
    keySkew(Tables.events(s, dir), col("user_id"), k = 10)

  val diagKeySkewSql: String =
    s"""WITH f AS (
         SELECT CAST(user_id AS VARCHAR) AS key_value, count(*) AS freq,
                ${h15Sql("CAST(user_id AS VARCHAR)")} AS kh
         FROM events GROUP BY 1),
       t AS (SELECT CAST(sum(freq) AS DOUBLE) AS n_rows FROM f),
       r AS (SELECT key_value, freq, kh,
               CAST(row_number() OVER (ORDER BY freq DESC, kh ASC) AS INT)
                 AS rank
             FROM f)
       SELECT rank, key_value, CAST(freq AS BIGINT) AS freq,
              round(freq / n_rows, 4) AS share
       FROM r, t WHERE rank <= 10"""
}
