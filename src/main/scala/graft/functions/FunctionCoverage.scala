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

  /** Error-safe arithmetic/casts — the `try_` family that turns
    * malformed-input failures into NULLs instead of killing a 100 TB
    * job in its final stage. The oracle mirrors each as an explicit
    * guard (CASE / TRY_CAST), which is also the semantics contract:
    * `try_x(args)` ≡ NULL exactly where the guard says so. */
  def trySafeFuncs(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    documents.select(
      col("doc_id"),
      // denominator doc_id % 2: null for every even id, a real
      // quotient for odd — per-row mixture, not a constant null
      try_divide(col("doc_id"), col("doc_id") % 2).as("div_mixed"),
      try_element_at(toks, (col("doc_id") % 300 + 1).cast("int"))
        .as("tok_mixed"),
      try_to_number(col("doc_id").cast("string"), lit("9999"))
        .cast("double").as("num_mixed"))
  }

  /** Edit-distance surface — the fuzzy-matching primitive for
    * near-dup candidate scoring on SHORT strings (names, titles,
    * codes). Quadratic per pair, so at scale it runs as a verifier
    * behind a blocking stage (LSH buckets / prefixes), never as the
    * pairing predicate itself. */
  def stringDistances(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      levenshtein(col("lang"), lit("english")).as("lev_lang"),
      levenshtein(substring(col("text"), 1, 16),
        substring(col("text"), 17, 16)).as("lev_halves"),
      levenshtein(col("source"), reverse(col("source"))).as("lev_pal"))

  /** Datetime arithmetic surface over orders: truncation, field
    * extraction, offsets, month arithmetic, diffs — projected to
    * epoch millis / longs / strings so both engines agree bit-wise
    * (session TZ is UTC everywhere; see Portable). */
  def datetimeFuncs(orders: DataFrame): DataFrame = {
    val ts = col("o_orderdate").cast("timestamp")
    orders.select(
      col("o_orderkey"),
      unix_millis(date_trunc("month", ts).cast("timestamp")).as("month_start_ms"),
      unix_millis(date_trunc("week", ts).cast("timestamp")).as("week_start_ms"),
      year(ts).cast("long").as("yr"),
      quarter(ts).cast("long").as("qtr"),
      month(ts).cast("long").as("mo"),
      dayofmonth(ts).cast("long").as("dom"),
      dayofweek(ts).cast("long").as("dow"),
      dayofyear(ts).cast("long").as("doy"),
      unix_millis(add_months(ts.cast("date"), 3).cast("timestamp"))
        .as("plus3mo_ms"),
      unix_millis(date_add(ts.cast("date"), 45).cast("timestamp"))
        .as("plus45d_ms"),
      unix_millis(last_day(ts.cast("date")).cast("timestamp"))
        .as("month_end_ms"),
      datediff(lit(java.sql.Date.valueOf("2002-01-01")), ts.cast("date"))
        .cast("long").as("days_to_2002"),
      date_format(ts, "yyyy-MM").as("ym"))
  }

  /** Map function surface: maps built from the events row, queried,
    * inverted, and reshaped — projected to sorted strings so the
    * result is portable (map iteration order never leaks). */
  def mapFuncs(events: DataFrame): DataFrame = {
    val m = map(
      lit("type"), col("event_type"),
      lit("user"), col("user_id").cast("string"),
      lit("sec"), col("sec").cast("string"))
    events.select(
      col("event_id"),
      size(m).cast("long").as("m_size"),
      array_join(array_sort(map_keys(m)), ",").as("m_keys"),
      element_at(m, "type").as("m_type"),
      map_contains_key(m, "user").as("has_user"),
      array_join(array_sort(transform(map_entries(m),
        // coalesce: concat_ws silently drops a null value where the
        // oracle's || would null the whole element — pin both to
        // "k=null" so null inputs stay comparable
        e => concat_ws("=", e.getField("key"),
          coalesce(e.getField("value"), lit("null"))))), "|")
        .as("m_flat"))
  }

  /** JSON function surface: serialize a row to JSON (the reference's
    * wire format, functions.js:211), extract fields back out both
    * path-wise and via a schema'd parse (SURVEY §2.7 F6). Only string
    * and long fields go through JSON — float repr is not
    * engine-portable. */
  def jsonFuncs(events: DataFrame): DataFrame = {
    // ignoreNullFields=false: serialize null fields as "u":null the
    // way the oracle engine does, instead of Spark's default
    // drop-the-key (they diverge on any null input field otherwise)
    val js = to_json(struct(
      col("event_type").as("t"),
      col("user_id").as("u"),
      col("sec").as("s")),
      java.util.Map.of("ignoreNullFields", "false"))
    events.select(
      col("event_id"),
      js.as("js"),
      get_json_object(js, "$.t").as("t_ex"),
      get_json_object(js, "$.u").cast("long").as("u_ex"),
      from_json(js, "t string, u bigint, s bigint",
        new java.util.HashMap[String, String]()).getField("s").as("s_parsed"),
      to_json(array(col("user_id"), col("sec"))).as("js_arr"))
  }

  /** Array function surface over tokenized documents — results
    * projected to scalars/strings so output schemas stay portable. */
  /** Higher-order functions over token arrays — the lambda surface
    * (filter/exists/forall/aggregate/transform) that keeps per-row
    * collection logic declarative and codegen-compatible instead of
    * dropping to UDFs. */
  def hofFuncs(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    documents.select(
      col("doc_id"),
      size(filter(toks, t => length(t) > 3)).as("n_long"),
      exists(toks, t => t === "the").as("has_the"),
      forall(toks, t => length(t) > 0).as("all_nonempty"),
      aggregate(toks, lit(0), (a, t) => a + length(t)).cast("long")
        .as("chars"),
      array_join(transform(toks, t => upper(substring(t, 1, 1))), "")
        .as("initials"))
  }

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

  /** Spark 4 VARIANT surface: `parse_json` into the binary variant
    * form, field access with `variant_get` / `try_variant_get`, and
    * `is_variant_null`. Extracted VALUES are the portable output (the
    * variant binary itself is engine-specific, like HLL registers);
    * the oracle reads the same fields with its own JSON accessors —
    * the contract is that variant-typed access loses nothing. */
  def variantFuncs(events: DataFrame): DataFrame = {
    val v = parse_json(col("props"))
    events.select(
      col("event_id"),
      try_variant_get(v, "$.k", "long").as("k_long"),
      try_variant_get(v, "$.k", "string").as("k_str"),
      try_variant_get(v, "$.missing", "string").as("missing_str"),
      (try_variant_get(v, "$.k", "long") * 2 + 1).as("k_derived"),
      try_variant_get(v, "$.k", "string").isNotNull.as("k_present"))
  }

  /** Spark 3.5 bitmap aggregates as an EXACT distinct count: keys
    * bucket into 32k-bit bitmaps (`bitmap_bucket_number` /
    * `bitmap_bit_position`), one `bitmap_construct_agg` per
    * (group, bucket), popcounts summed per group. The oracle is plain
    * COUNT(DISTINCT) — the equality IS the contract, same shape as
    * the salted-join query. Scale: the shuffle carries ≤ 4 KB bitmap
    * segments per (group, bucket) instead of one row per distinct
    * key, and segments OR-merge map-side. */
  def bitmapDistinct(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"),
        bitmap_bucket_number(col("l_partkey")).as("_b"))
      .agg(bitmap_count(bitmap_construct_agg(
        bitmap_bit_position(col("l_partkey")))).as("_c"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("_c")).as("n_distinct_parts"))
}
