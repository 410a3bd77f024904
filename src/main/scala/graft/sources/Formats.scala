package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Interchange-format ROUND-TRIP gates (SURVEY §2.1 extension rows):
  * the two formats a 100 TB corpus actually arrives in beyond
  * parquet/TSV — line-delimited JSON (every public LLM-corpus dump:
  * The Pile, RedPajama, Dolma) and ORC (Hive-native warehouses) —
  * each exercised end-to-end (write → read → verify against the
  * source-of-truth parquet) under a full hash oracle, so the gate
  * catches escaping bugs, schema drift, type coercions, and malformed-
  * record mishandling rather than just "the API call didn't throw".
  *
  * Both paths follow the house ingest rules ([[Readers]]): explicit
  * schemas (inference costs an extra full pass at scale), splittable
  * formats (line-delimited JSON and ORC stripes both parallelize), and
  * malformed records ROUTED (PERMISSIVE + corrupt-record column), not
  * silently dropped — at warehouse scale "how many lines were bad" is
  * a monitored signal, not a debug detail.
  */
object Formats {

  /** The documents table as it ships in corpus dumps. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** q214 — JSONL ingest with corrupt-record ISOLATION, gated as a
    * round trip: every document is serialized to one JSON line
    * (`to_json` — real escaping of quotes/backslashes/control chars,
    * not string concatenation), lines for `doc_id % corruptMod == 0`
    * are deterministically TRUNCATED into malformed JSON (the q202
    * planting convention — the stock fixture has no bad lines, and a
    * corrupt-routing gate with zero corrupt rows is vacuous), the file
    * is read back with an explicit schema in PERMISSIVE mode, and the
    * output carries one row per input line: parsed fields plus
    * `md5(text)` for good rows (text fidelity through JSON escaping),
    * nulls plus the regexp-recovered doc_id for corrupt rows. The
    * DuckDB oracle states the round-trip invariant directly from
    * `documents` — any escaping bug, dropped/duplicated line, type
    * coercion, or mis-routed record fails the hash.
    *
    * Scale: line-delimited JSON is SPLITTABLE (unlike multi-line
    * JSON), so a 100 TB dump fans out by HDFS block; the explicit
    * schema keeps the scan single-pass; PERMISSIVE routing is
    * per-record with no job failure. The write/read both run through
    * Spark (no driver loop). */
  def jsonlRoundtrip(
      spark: SparkSession, documents: DataFrame,
      corruptMod: Int = 23): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl_").toString + "/docs"
    writeJsonl(documents, dir, corruptMod)
    routeCorrupt(spark.read
      .schema(docSchema.add(StructField("_corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir))
      .orderBy("doc_id")
  }

  /** The q214 writer half: one JSON line per document via `to_json`,
    * with lines for `doc_id % corruptMod == 0` deterministically
    * truncated into malformed JSON (no corruption when
    * `corruptMod == 0`). */
  def writeJsonl(
      documents: DataFrame, dir: String, corruptMod: Int = 23): Unit = {
    val good = to_json(struct(col("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars")))
    documents
      .select(
        (if (corruptMod == 0) good
         else when(pmod(col("doc_id"), lit(corruptMod)) === 0,
           concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
             lit(",\"text\":\"truncated")))
           .otherwise(good)).as("value"))
      .write.mode("overwrite").text(dir)
  }

  /** The q214 routing half, shared by the batch and STREAMING readers
    * (one body, so batch==stream parity is a property, not a hope):
    * good rows keep their parsed fields plus md5(text); corrupt rows
    * carry nulls plus the regexp-recovered doc_id. No sort here —
    * streaming plans cannot sort; the batch gate adds its own. */
  def routeCorrupt(back: DataFrame): DataFrame =
    back.select(
      coalesce(col("doc_id"),
        regexp_extract(col("_corrupt"), "\"doc_id\":(\\d+)", 1)
          .cast("long")).as("doc_id"),
      when(col("_corrupt").isNotNull, 1L).otherwise(0L).as("corrupt"),
      col("lang"), col("source"), col("n_chars"),
      when(col("_corrupt").isNull, md5(col("text")))
        .otherwise(lit(null).cast("string")).as("text_md5"))

  /** Streaming twin of the q214 front door: `readStream` over a JSONL
    * directory with the SAME explicit schema, PERMISSIVE corrupt
    * routing, and [[routeCorrupt]] body — the shape a continuously
    * arriving corpus dump is ingested with (new files appear, the
    * stream absorbs them; corrupt lines route, never kill the job).
    * StreamingSpec asserts stream == batch on the same directory. */
  def jsonlStream(spark: SparkSession, dir: String): DataFrame =
    routeCorrupt(spark.readStream
      .schema(docSchema.add(StructField("_corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir))

  /** q218 — ORC round trip with predicate pushdown: lineitem is
    * written through the [[Writers.orc]] sink (zstd — the codec a
    * production ORC warehouse runs), read back through [[Readers.orc]]
    * with a
    * range predicate (the class ORC pushes into stripe/row-group
    * elimination), and folded to the q02 aggregate shape. The oracle
    * computes the same aggregate from the source-of-truth parquet —
    * the hash catches any type round-trip error (int32 linenumber,
    * doubles, strings) or row loss/duplication through the ORC
    * writer/reader pair. IoSpec additionally pins schema equality and
    * the `PushedFilters` line in the ORC scan plan.
    *
    * Scale: ORC stripes parallelize like parquet row groups; the
    * pushed range predicate skips stripes via min/max stats exactly as
    * parquet does — the format swap costs nothing architecturally,
    * which is the point of gating it. */
  def orcRoundtrip(spark: SparkSession, t: Tables): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_orc_").toString + "/lineitem"
    Writers.orc(t.lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus"), dir)
    Readers.orc(spark, dir)
      .filter(col("l_quantity") >= 25.0)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        round(avg("l_tax"), 4).as("avg_tax"))
      .orderBy("l_returnflag", "l_linestatus")
  }
}
