package graft

import org.scalatest.funsuite.AnyFunSuite

/** SLT-style golden-file runner (reference test backbone:
  * datafusion/sqllogictest/test_files (.slt corpus) run against DataFusion AND a
  * Postgres oracle). Our corpus lives in src/test/resources/slt :
  * portable ANSI SQL whose goldens were computed by DuckDB
  * (tools/gen_slt.py) — here each query replays through spark.sql over
  * the same sf0.001 tables and must reproduce the golden byte-for-byte
  * under the shared value formatting (NULL / %.4f floats / true/false /
  * ISO dates, tab-joined, ordered compare).
  *
  * This is a different axis from the Verify gate: ONE SQL text, two
  * engines — it pins Spark's SQL-dialect semantics (null sorting,
  * FILTER clauses, set-op duplicate handling, window frames) against
  * an independent implementation.
  */
class SltSpec extends AnyFunSuite {
  /** Families are DISCOVERED from the classpath resource directory, not
    * hardcoded: a file tools/gen_slt.py emits that isn't listed here
    * would otherwise be silently skipped (that drift actually happened —
    * six generated families went untested until discovery replaced the
    * hand-maintained list). `knownFamilies` remains only as a minimum
    * floor: discovery must find at least everything that was ever green,
    * so a broken resource copy fails loudly instead of shrinking the run.
    */
  private val families: Seq[String] = {
    val url = getClass.getResource("/slt")
    require(url != null && url.getProtocol == "file",
      "slt resource dir not on a file classpath — cannot discover corpus")
    val found = new java.io.File(url.toURI).listFiles()
      .map(_.getName).filter(_.endsWith(".slt")).map(_.stripSuffix(".slt"))
      .toSeq.sorted
    val missing = knownFamilies.filterNot(found.contains)
    require(missing.isEmpty, s"slt families vanished from resources: $missing")
    found
  }

  private def knownFamilies = Seq("scalar_string", "scalar_math",
    "scalar_datetime", "agg", "join_setop", "window", "subquery",
    "bits_binary", "predicates", "grouping", "null_sort",
    "arrays", "casts_try", "null_logic", "string_fns2", "math_fns2",
    "datetime2", "agg_edge", "window2", "regex", "subquery2", "setop_edge",
    "order_limit", "structs", "maps", "arrays_native", "fns_dialect",
    "float_edge", "from_surface", "window3", "agg_edge3", "join_multi",
    "coercion", "null_args", "exists_edge", "regex2", "cte2",
    "semi_struct_edge", "math_fns3", "subquery3", "distinct_order",
    "arrays3", "window4", "string_edge3", "group_having", "datetime3",
    "values_rows", "null_keys", "quotes_specials", "identifiers",
    "wildcard", "references", "int_boundaries", "map_struct_nulls",
    "regexp_classes", "agg_edges4", "datetime_boundaries",
    "cond_null_edges", "string_boundaries", "decimal_edges",
    "window_frames5", "interval_arith", "nested_null_arrays",
    "notin_null_semantics", "scalar_subq_empty", "join_using_natural",
    "setop_coercion2", "having_group_edges", "distinct_agg_multi",
    "orderby_edges", "arith_division", "array_surface2",
    "extract_surface", "agg_null_empty", "regex_surface3",
    "string_pad_split", "cast_string_edges", "bool_null_truth",
    "exists_depth", "datetime_format", "map_surface2",
    "lateral_subquery", "string_measure", "case_when_types",
    "quantified_subq", "grouping_sets2", "window_navigation2",
    "rounding_surface", "stats_regression", "stats_moments",
    "sequence_unnest", "listagg_surface", "percentile_modes",
    "encoding_surface", "json_path", "row_comparisons", "try_arith",
    "recursive_cte", "window_over_agg", "between_like_combos",
    "limit_subquery", "coalesce_chains", "select_no_from",
    "epoch_conversions", "collation_order", "distinct_on_emulation",
    "overflow_fn_edges", "agg_dense1", "agg_dense2", "string_dense4",
    "regexp_dense4", "map_dense2", "array_dense4", "datetime_dense4",
    "cond_bool_dense", "join_null_dense", "window_dense6",
    "setop_dense", "values_dense", "decimal_dense2", "correlated_dense",
    "json_dense2", "grouping_dense3", "window_frames7",
    "interval_dense2", "codec_dense", "arrays_dense5", "string_dense5",
    "window_dense8", "agg_dense3", "null_dense3", "struct_dense3",
    "cast_dense3", "exists_dense2", "math_dense4",
    // round-6 additions (sessions 1-3)
    "agg_bool_countif", "agg_filter_dense", "array_dense6",
    "array_mut_surface", "array_sort_lambda", "array_zip_explode",
    "binary_type", "cast_conventions", "date_clamping",
    "decimal_propagation", "explode_outer_dense", "fuzz_agg",
    "fuzz_array", "fuzz_bool", "fuzz_cast", "fuzz_date", "fuzz_decimal",
    "fuzz_groupsets", "fuzz_hof", "fuzz_int", "fuzz_join", "fuzz_map",
    "fuzz_query", "fuzz_setop", "fuzz_string", "fuzz_struct",
    "fuzz_subquery", "fuzz_window", "groupby_all", "hex_literals",
    "hof_lambda_dense", "interval_typed", "join_dense10",
    "join_key_coercion", "math_special", "name_resolution", "num_format",
    "spark_fn_surface", "spark_fn_surface2", "sql_dialect_surface",
    "stats_dense", "tz_conversion", "unicode_dense", "union_widening2",
    "wildcard_except", "window_dense10", "window_dense9",
    "window_range_desc",
    // round-7 additions
    "frame_shorthand", "fuzz_nullsort", "struct_ordering",
    "ts_dst_matrix", "ts_tz_roundtrip", "ts_trunc_local",
    "ts_interval_clamp", "ts_format_matrix", "ts_epoch_edges",
    "decimal_matrix", "cast_matrix2", "unsigned_widening", "time_mapping")

  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    Engine.registerAll(s, "/root/testdata/sf0.001")
    s
  }

  private def fmt(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case d: java.lang.Double => "%.4f".format(d)
    case f: java.lang.Float => "%.4f".format(f.toDouble)
    case bd: java.math.BigDecimal =>
      // quantize the EXACT decimal (same as gen_slt's Decimal path) —
      // rounding via doubleValue() could diverge at scale>4 ties
      bd.setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp =>
      fail(s"raw timestamp in SLT output ($t) — corpus rule violation")
    case seq: scala.collection.Seq[_] =>
      // mirror python's str(list) — the golden shape for array outputs
      seq.map(fmtElem).mkString("[", ", ", "]")
    case other => other.toString
  }

  private def fmtElem(e: Any): String = e match {
    case null => "None"
    case b: java.lang.Boolean => if (b) "True" else "False"
    case s: String => s"'$s'"
    case _: java.lang.Double | _: java.lang.Float =>
      fail("float inside array output — corpus rule violation")
    // nested array: python str() of the inner list, recursively
    case seq: scala.collection.Seq[_] =>
      seq.map(fmtElem).mkString("[", ", ", "]")
    case other => other.toString
  }

  private case class Case(sql: String, golden: Seq[String], line: Int)

  private def parse(family: String): Seq[Case] = {
    val in = getClass.getResourceAsStream(s"/slt/$family.slt")
    require(in != null, s"missing /slt/$family.slt")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val cases = Vector.newBuilder[Case]
    var i = 0
    while (i < lines.length) {
      if (lines(i).trim == "query") {
        val start = i
        i += 1
        val sql = new StringBuilder
        def unterminated(): Nothing = fail(
          s"$family.slt: case at line ${start + 1} has no ---- terminator")
        while (i < lines.length &&
            lines(i).trim != "----" && lines(i).trim != "--duck--") {
          sql.append(lines(i)).append('\n'); i += 1
        }
        if (i >= lines.length) unterminated()
        // a two-variant case carries the DuckDB text (golden provenance)
        // in a --duck-- section; only the Spark text is executed here
        while (i < lines.length && lines(i).trim != "----") i += 1
        if (i >= lines.length) unterminated()
        i += 1 // skip ----
        val golden = Vector.newBuilder[String]
        while (i < lines.length && lines(i).nonEmpty) {
          golden += lines(i); i += 1
        }
        cases += Case(sql.toString.trim, golden.result(), start + 1)
      } else i += 1
    }
    cases.result()
  }

  families.foreach { family =>
    test(s"slt/$family matches DuckDB goldens") {
      val cases = parse(family)
      assert(cases.nonEmpty)
      cases.foreach { c =>
        val got = spark.sql(c.sql).collect()
          .map(r => (0 until r.length).map(i => fmt(r.get(i))).mkString("\t"))
          .toSeq
        assert(got == c.golden,
          s"\n$family.slt line ${c.line}:\n${c.sql}\n" +
            s"expected:\n${c.golden.mkString("\n")}\ngot:\n${got.mkString("\n")}")
      }
    }
  }
}
