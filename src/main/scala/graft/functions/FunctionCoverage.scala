package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar / string / array function surface (SURVEY §2.7 F1-F11 and
  * beyond), exercised as oracle-checked projections. Everything is a
  * built-in Catalyst expression — zero UDFs, fully codegen'd, scales
  * as a pure map over the scan. */
object FunctionCoverage {

  /** Scalar math + time formatting over events:
    * clamp (F7), round/floor/ceil/abs/pmod (F8/F9), epoch→display
    * 24h and 12h clock strings (F4/F11). */
  def scalarFuncs(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      greatest(lit(0.0), col("value") - 100.0).as("clamped"),
      round(col("value")).cast("long").as("rounded"),
      floor(col("value") / 10).cast("long").as("floored"),
      ceil(col("value") / 10).cast("long").as("ceiled"),
      abs(col("value") - 250.0).as("abs_centered"),
      pmod(col("user_id"), lit(7)).as("mod7"),
      date_format(timestamp_seconds(col("sec")), "HH:mm:ss").as("clock24"),
      date_format(timestamp_seconds(col("sec")), "hh:mm:ss a").as("clock12"))

  /** String function surface over documents: case, slicing, padding,
    * replace, trim, position, regexp extraction/counting. */
  def stringFuncs(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      upper(substring(col("source"), 1, 3)).as("src_upper"),
      lpad(col("doc_id").cast("string"), 6, "0").as("id_padded"),
      regexp_replace(col("lang"), "e", "E").as("lang_replaced"),
      length(trim(col("text"))).as("trimmed_len"),
      instr(col("text"), "spark").as("spark_pos"),
      regexp_extract(col("text"), "(\\w+) (\\w+)", 2).as("second_word"),
      size(regexp_extract_all(col("text"), lit("(sh)"), lit(1))).as("sh_count"),
      reverse(col("lang")).as("lang_rev"),
      concat_ws("-", col("lang"), col("source")).as("lang_src"))

  /** Array function surface over tokenized documents — results
    * projected to scalars/strings so output schemas stay portable. */
  def arrayFuncs(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    documents.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      array_join(slice(toks, 1, 3), " ").as("first3"),
      array_join(slice(toks, -2, 2), " ").as("last2"),
      array_contains(toks, "the").as("has_the"),
      array_min(toks).as("min_token"),
      array_max(toks).as("max_token"),
      size(array_distinct(toks)).as("n_distinct"),
      array_join(array_sort(array_distinct(slice(toks, 1, 5))), ",")
        .as("first5_sorted"),
      element_at(toks, 1).as("head_token"))
  }
}
