package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** §2.G — scalar function surface (string / regex / date / math /
  * conditional / array / higher-order / map / JSON).
  *
  * Everything is a built-in Column function (codegen'd, no UDFs), so these
  * stay inside WholeStageCodegen and vectorize over the parquet scan.
  * Engine-difference notes are inline where DuckDB semantics diverge
  * (dayofweek base, regexp_replace global flag, ceil/floor return types).
  */
object Scalars extends QueryModule {

  def all: Seq[Q] = Seq(
    Q(
      "fn_string",
      (s, dir) =>
        Tables.customer(s, dir)
          .select(
            col("c_custkey"),
            lower(col("c_name")).as("lo"),
            upper(col("c_mktsegment")).as("up"),
            substring(col("c_name"), 1, 8).as("sub"),
            concat(col("c_name"), lit("#"), col("c_mktsegment")).as("cat"),
            trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
            lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
            length(col("c_name")).as("len"))
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey,
               lower(c_name) AS lo,
               upper(c_mktsegment) AS up,
               substring(c_name, 1, 8) AS sub,
               c_name || '#' || c_mktsegment AS cat,
               trim('  ' || c_mktsegment || '  ') AS trimmed,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
               CAST(length(c_name) AS INTEGER) AS len
        FROM customer
        ORDER BY c_custkey""")),

    // DuckDB regexp_replace replaces only the first match unless the 'g'
    // option is passed; Spark always replaces globally.
    Q(
      "fn_string_regex",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            regexp_extract(col("text"), "^([a-z]+)", 1).as("first_tok"),
            regexp_replace(substring(col("text"), 1, 30), "[aeiou]", "_")
              .as("devoweled"),
            size(split(col("text"), " ")).as("n_toks"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               regexp_extract(text, '^([a-z]+)', 1) AS first_tok,
               regexp_replace(substring(text, 1, 30), '[aeiou]', '_', 'g') AS devoweled,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks
        FROM documents
        ORDER BY doc_id""")),

    // DuckDB dayofweek is 0-based (Sunday=0); Spark is 1-based (Sunday=1).
    Q(
      "fn_date",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofweek(col("o_orderdate")).as("dow"),
            // DuckDB date_trunc('month', ts) returns DATE; Spark's returns
            // TIMESTAMP — cast to date so the output schemas agree.
            date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
            datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
              .as("days_before_2002"),
            add_months(col("o_orderdate"), 3).as("plus3m"))
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               date_trunc('month', o_orderdate) AS month_start,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_before_2002,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
        FROM orders
        ORDER BY o_orderkey""")),

    // Spark ceil/floor on double return BIGINT; DuckDB returns DOUBLE — cast.
    Q(
      "fn_math",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            round(col("l_extendedprice"), 2).as("rounded"),
            abs(col("l_discount") - lit(0.05)).as("abs_off"),
            ceil(col("l_extendedprice")).as("ceiled"),
            floor(col("l_extendedprice")).as("floored"),
            round(log(col("l_extendedprice") + lit(1.0)), 4).as("ln_p1"),
            round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
            pmod(col("l_orderkey"), lit(7L)).as("key_mod"))
          // lineitem has no unique key — sort on enough value columns that
          // key-tied rows are identical in every output column.
          .orderBy("l_orderkey", "l_linenumber", "rounded", "abs_off",
            "qty_sq"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 2) AS rounded,
               abs(l_discount - 0.05) AS abs_off,
               CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
               CAST(floor(l_extendedprice) AS BIGINT) AS floored,
               round(ln(l_extendedprice + 1.0), 4) AS ln_p1,
               round(pow(l_quantity, 2), 4) AS qty_sq,
               ((l_orderkey % 7) + 7) % 7 AS key_mod
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, rounded, abs_off, qty_sq""")),

    Q(
      "fn_conditional",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") < 100000.0, "low")
              .when(col("o_totalprice") < 300000.0, "mid")
              .otherwise("high").as("band"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
              .as("status_or_open"),
            greatest(col("o_totalprice"), lit(250000.0)).as("at_least"),
            least(col("o_totalprice"), lit(250000.0)).as("at_most"))
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 100000.0 THEN 'low'
                    WHEN o_totalprice < 300000.0 THEN 'mid'
                    ELSE 'high' END AS band,
               coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
               greatest(o_totalprice, 250000.0) AS at_least,
               least(o_totalprice, 250000.0) AS at_most
        FROM orders
        ORDER BY o_orderkey""")),

    // Arrays are 1-indexed via element_at in Spark and [] in DuckDB.
    // float32 values are widened to double before rounding on both sides.
    Q(
      "fn_array",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            round(element_at(col("embedding"), 1).cast(DoubleType), 4)
              .as("first_v"),
            round(element_at(col("embedding"), 10).cast(DoubleType), 4)
              .as("tenth_v"),
            round(element_at(col("embedding"), 64).cast(DoubleType), 4)
              .as("last_v"))
          .orderBy("vec_id"),
      oracle = Some("""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 4) AS first_v,
               round(CAST(embedding[10] AS DOUBLE), 4) AS tenth_v,
               round(CAST(embedding[64] AS DOUBLE), 4) AS last_v
        FROM embeddings
        ORDER BY vec_id""")),

    // Higher-order lambdas: transform / filter / aggregate (fold). The fold
    // runs left-to-right on both engines; round(…,4) guards the last ulp.
    Q(
      "fn_array_higher_order",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .withColumn("emb_d", col("embedding").cast("array<double>"))
          .select(
            col("vec_id"),
            round(
              sqrt(aggregate(col("emb_d"), lit(0.0), (acc, x) => acc + x * x)),
              4).as("l2_norm"),
            size(filter(col("emb_d"), x => x > lit(0.0))).as("n_pos"),
            round(element_at(transform(col("emb_d"), x => x * 2.0), 1), 4)
              .as("scaled_first"))
          .orderBy("vec_id"),
      oracle = Some("""
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
               CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0)) AS INTEGER) AS n_pos,
               round(CAST(embedding[1] AS DOUBLE) * 2.0, 4) AS scaled_first
        FROM embeddings
        ORDER BY vec_id""")),

    // MapType surface: build a map from a kv string, read keys/values back.
    // Output columns are flattened to scalars so the oracle can check them.
    Q(
      "fn_map",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn(
            "kv",
            str_to_map(
              concat(lit("type:"), col("event_type"), lit(",user:"),
                col("user_id").cast("string")),
              lit(","), lit(":")))
          .select(
            col("event_id"),
            element_at(col("kv"), "type").as("type_v"),
            element_at(col("kv"), "user").as("user_v"),
            size(map_keys(col("kv"))).as("n_keys"),
            // Key-sorted entries rendered to one string: the DuckDB-
            // comparable canonical form of a MAP column (map iteration
            // order is not itself comparable across engines).
            array_join(
              transform(array_sort(map_entries(col("kv"))),
                e => concat(e.getField("key"), lit("="),
                  e.getField("value"))), ";").as("kv_render"))
          .orderBy("event_id"),
      oracle = Some("""
        SELECT event_id,
               event_type AS type_v,
               CAST(user_id AS VARCHAR) AS user_v,
               2 AS n_keys,
               'type=' || event_type || ';user=' || CAST(user_id AS VARCHAR)
                 AS kv_render
        FROM events
        ORDER BY event_id""")),

    Q(
      "fn_json",
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
              .getField("k").as("k_long"))
          .orderBy("event_id"),
      oracle = Some("""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long
        FROM events
        ORDER BY event_id""")),

    // Bitwise scalar surface over the 64-bit event id: shifts, masks, xor,
    // popcount — the primitives the SimHash/LSH operators build on.
    Q(
      "fn_bitwise",
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("event_id") < 2000)
          .select(
            col("event_id"),
            expr("shiftright(event_id, 3)").as("shr3"),
            expr("shiftleft(event_id & 255, 2)").as("masked_shl2"),
            expr("event_id ^ 1431655765").as("xor_pattern"),
            expr("bit_count(event_id)").as("popcount"))
          .orderBy("event_id"),
      oracle = Some("""
        SELECT event_id,
               event_id >> 3 AS shr3,
               (event_id & 255) << 2 AS masked_shl2,
               xor(event_id, 1431655765) AS xor_pattern,
               bit_count(event_id) AS popcount
        FROM events WHERE event_id < 2000 ORDER BY event_id""")),

    // ANSI-safe ingestion scalars: malformed values become nulls instead of
    // failing the job — at 100 TB a single bad record must never kill a
    // pipeline. try_cast semantics match DuckDB TRY_CAST.
    Q(
      "fn_try_ansi",
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_id"),
            // props is JSON like {"k": 87} — casting the raw string to a
            // number fails → null; extracting then casting succeeds.
            try_to_number(col("props"), lit("999999")).cast("long").as("bad_cast"),
            get_json_object(col("props"), "$.k").cast("long").as("good_cast"),
            try_divide(col("value"), col("event_id") % 3).as("maybe_div"))
          .orderBy("event_id"),
      oracle = Some("""
        SELECT event_id,
               TRY_CAST(props AS BIGINT) AS bad_cast,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS good_cast,
               CASE WHEN event_id % 3 = 0 THEN NULL
                    ELSE value / (event_id % 3) END AS maybe_div
        FROM events ORDER BY event_id""")),

    // Spark 4 VARIANT ingestion of dynamic JSON: parse once to a binary
    // variant, extract typed paths lazily. The scale rationale: variant
    // parse + shredded access beats repeated get_json_object string
    // re-parsing when many fields are extracted. DuckDB has no variant
    // TYPE, but the OUTPUT here is plain longs — so the oracle (round
    // 11) replays the path extraction with json_extract_string and
    // hash-checks that the variant-typed and string-path values agree
    // in both engines (diff all-zero).
    Q(
      "fn_json_variant",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"), parse_json(col("props")).as("v"),
            get_json_object(col("props"), "$.k").cast("long").as("k_str"))
          .select(col("event_id"),
            try_variant_get(col("v"), "$.k", "long").as("k_variant"),
            col("k_str"))
          .withColumn("diff", coalesce(col("k_variant") - col("k_str"), lit(-1L)))
          .orderBy("event_id"),
      oracle = Some("""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                 AS k_variant,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                 AS k_str,
               coalesce(
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                 - TRY_CAST(json_extract_string(props, '$.k') AS BIGINT),
                 -1) AS diff
        FROM events ORDER BY event_id""")),

    // Binary-text codecs: base64 / hex / digest round-trips — the
    // serialization scalars an ingestion boundary leans on (opaque keys,
    // content digests, wire-safe payload columns). All pure column math,
    // fully codegen.
    Q(
      "fn_encode",
      (s, dir) => {
        val prefix = substring(col("text"), 1, 24)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            base64(prefix.cast("binary")).as("b64"),
            hex(prefix.cast("binary")).as("hex_u"),
            (unbase64(base64(prefix.cast("binary"))).cast("string") === prefix)
              .as("roundtrip_ok"),
            md5(prefix.cast("binary")).as("md5_hex"),
            sha2(prefix.cast("binary"), 256).as("sha256_hex"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id, substring(text, 1, 24) AS prefix
                   FROM documents)
        SELECT doc_id,
               base64(CAST(prefix AS BLOB)) AS b64,
               hex(prefix) AS hex_u,
               decode(from_base64(base64(CAST(prefix AS BLOB)))) = prefix
                 AS roundtrip_ok,
               md5(prefix) AS md5_hex,
               sha256(prefix) AS sha256_hex
        FROM t ORDER BY doc_id""")),

    // URL decomposition with Spark's native parse_url (HOST/PATH/QUERY +
    // single-parameter extraction). The oracle replays the same semantics
    // with plain regexes — different mechanism, identical values — so the
    // whole operator is hash-checked despite DuckDB lacking parse_url.
    Q(
      "fn_url",
      (s, dir) => {
        val url = concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id"),
          lit("?lang="), col("lang"), lit("&ref=ingest"))
        Tables.documents(s, dir)
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"), col("url"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY")).as("query"),
            parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id,
                 'https://' || source || '.example.com/docs/' || doc_id ||
                 '?lang=' || lang || '&ref=ingest' AS url
          FROM documents)
        SELECT doc_id, url,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?]+([^?]*)', 1) AS path,
               regexp_extract(url, '\?(.*)$', 1) AS query,
               regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
        FROM t ORDER BY doc_id""")),

    // Calendar-field extraction + interval arithmetic beyond fn_date's
    // basics: quarter/ISO-week/day-of-year, month-end snap, day offsets,
    // and strftime-style rendering. All derived columns are DATE/INT/
    // STRING (never raw timestamps) per the tz-schema parity rule
    // (NOTES.md round-2). Pure per-row codegen'd projection — scans one
    // column, no shuffle.
    Q(
      "fn_interval",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            quarter(col("o_orderdate")).as("qtr"),
            dayofyear(col("o_orderdate")).as("doy"),
            weekofyear(col("o_orderdate")).as("iso_week"),
            last_day(col("o_orderdate")).as("month_end"),
            date_add(col("o_orderdate").cast("date"), 45).as("plus45d"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(o_orderdate AS DATE) + 45 AS plus45d,
               strftime(o_orderdate, '%Y-%m') AS ym
        FROM orders
        ORDER BY o_orderkey""")),

    // Spark 4 collation surface: grouping under the UTF8_LCASE collation
    // folds deliberately case-noised segment labels without materializing
    // a lower() key — the collation IS the equality semantics, visible to
    // Catalyst (vs a lower() wrapper that blocks stats on the original
    // column). The oracle proves the semantics equal GROUP BY lower().
    // n_variants counts case-SENSITIVE distinct members inside each
    // case-insensitive group.
    Q(
      "fn_collation",
      (s, dir) => {
        val seg = col("c_mktsegment")
        val cased = when(col("c_custkey") % 3 === 0, upper(seg))
          .when(col("c_custkey") % 3 === 1, lower(seg))
          .otherwise(concat(upper(substring(seg, 1, 1)),
            lower(substring(seg, 2, 100))))
        Tables.customer(s, dir)
          .select(col("c_custkey"), cased.as("seg"))
          .groupBy(collate(col("seg"), "UTF8_LCASE").as("k"))
          .agg(count(lit(1)).as("n_cust"),
            countDistinct(col("seg")).as("n_variants"))
          .select(lower(col("k")).cast("string").as("segment"),
            col("n_cust"), col("n_variants"))
          .orderBy("segment")
      },
      oracle = Some("""
        WITH t AS (
          SELECT c_custkey,
                 CASE c_custkey % 3
                   WHEN 0 THEN upper(c_mktsegment)
                   WHEN 1 THEN lower(c_mktsegment)
                   ELSE upper(substr(c_mktsegment, 1, 1)) ||
                        lower(substr(c_mktsegment, 2))
                 END AS seg
          FROM customer)
        SELECT lower(seg) AS segment,
               count(*) AS n_cust,
               count(DISTINCT seg) AS n_variants
        FROM t GROUP BY lower(seg) ORDER BY segment""")),

    // Embedded-XML parsing (from_xml, new in Spark 4): the XML payload is
    // synthesized from table columns with DECIMAL-rendered numerics so the
    // text is byte-identical in both engines, then Spark parses it with
    // the real XML reader while the oracle replays field extraction with
    // regexes — proving parse fidelity, not just string reassembly.
    Q(
      "fn_xml",
      (s, dir) => {
        val priceTxt = col("o_totalprice").cast("decimal(12,2)").cast("string")
        val xml = concat(lit("<o><k>"), col("o_orderkey"),
          lit("</k><s>"), col("o_orderstatus"),
          lit("</s><p>"), priceTxt, lit("</p></o>"))
        Tables.orders(s, dir)
          .select(col("o_orderkey"), xml.as("payload"))
          .select(col("o_orderkey"),
            from_xml(col("payload"),
              org.apache.spark.sql.types.StructType.fromDDL(
                "k LONG, s STRING, p DOUBLE")).as("x"))
          .select(col("o_orderkey"), col("x.k").as("k"), col("x.s").as("s"),
            col("x.p").as("p"))
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        WITH t AS (
          SELECT o_orderkey,
                 '<o><k>' || o_orderkey || '</k><s>' || o_orderstatus ||
                 '</s><p>' ||
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) ||
                 '</p></o>' AS payload
          FROM orders)
        SELECT o_orderkey,
               CAST(regexp_extract(payload, '<k>([^<]*)</k>', 1) AS BIGINT)
                 AS k,
               regexp_extract(payload, '<s>([^<]*)</s>', 1) AS s,
               CAST(regexp_extract(payload, '<p>([^<]*)</p>', 1) AS DOUBLE)
                 AS p
        FROM t ORDER BY o_orderkey""")),

    // Embedded-CSV parsing (from_csv): one csv line per event rendered
    // with decimal-quantized values, parsed back by Spark's CSV reader;
    // the oracle splits the identical text. The wire-format pair to
    // fn_xml — both are the "column holds a serialized record" shape
    // ingestion pipelines hit constantly.
    Q(
      "fn_csv",
      (s, dir) => {
        val vTxt = round(col("value"), 2).cast("decimal(8,2)").cast("string")
        val line = concat_ws(",", col("event_id"), col("event_type"), vTxt)
        Tables.events(s, dir)
          .select(col("event_id"), line.as("line"))
          .select(col("event_id"),
            from_csv(col("line"),
              org.apache.spark.sql.types.StructType.fromDDL(
                "id LONG, t STRING, v DOUBLE"),
              Map.empty[String, String]).as("c"))
          .select(col("event_id"), col("c.id").as("id"), col("c.t").as("t"),
            col("c.v").as("v"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT event_id,
                 event_id || ',' || event_type || ',' ||
                 CAST(CAST(round(value, 2) AS DECIMAL(8,2)) AS VARCHAR)
                   AS line
          FROM events)
        SELECT event_id,
               CAST(string_split(line, ',')[1] AS BIGINT) AS id,
               string_split(line, ',')[2] AS t,
               CAST(string_split(line, ',')[3] AS DOUBLE) AS v
        FROM t ORDER BY event_id""")),

    // Higher-order MAP functions: transform_keys/values, map_filter,
    // map_zip_with — each result rendered to the canonical key-sorted
    // entries string (fn_map's discipline: map iteration order is not
    // comparable across engines, its sorted render is). The oracle
    // replays the lambda semantics on the scalar inputs directly; all
    // values are small exact integers. concat_ws on both sides skips
    // the NULL branches, so a filtered-empty map renders as ''.
    Q(
      "fn_map_higher_order",
      (s, dir) => {
        val render = (m: org.apache.spark.sql.Column) => array_join(
          transform(array_sort(map_entries(m)),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast("string"))), ";")
        val m1 = map_from_arrays(array(lit("q"), lit("u")),
          array(col("event_id") % 7, col("user_id") % 5))
        val m2 = map_from_arrays(array(lit("q"), lit("x")),
          array(lit(10L), lit(1L)))
        Tables.events(s, dir)
          .select(col("event_id"),
            render(transform_values(m1, (_, v) => v * 2)).as("doubled"),
            render(transform_keys(m1, (k, _) => concat(lit("k_"), k)))
              .as("prefixed"),
            render(map_filter(m1, (_, v) => v >= 3)).as("filtered"),
            render(map_zip_with(m1, m2,
              (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))))
              .as("zipped"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id,
               'q=' || (event_id % 7) * 2 || ';u=' || (user_id % 5) * 2
                 AS doubled,
               'k_q=' || event_id % 7 || ';k_u=' || user_id % 5
                 AS prefixed,
               concat_ws(';',
                 CASE WHEN event_id % 7 >= 3
                      THEN 'q=' || event_id % 7 END,
                 CASE WHEN user_id % 5 >= 3
                      THEN 'u=' || user_id % 5 END) AS filtered,
               'q=' || (event_id % 7 + 10) || ';u=' || user_id % 5
                 || ';x=1' AS zipped
        FROM events ORDER BY event_id""")),

    // StructType surface: build structs, compare them (lexicographic by
    // field order — both engines), aggregate min/max over them, read
    // fields back out. min(struct(date, price, key)) is the
    // "earliest-with-deterministic-tie-break" idiom in one aggregate:
    // the struct ordering resolves date ties by price then key, so the
    // result is total-order exact with no window pass. Output flattens
    // every field (a raw struct column is not hash-comparable across
    // engines; its fields are).
    Q(
      "fn_struct",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val sd = struct(col("o_orderdate").as("d"),
          col("o_totalprice").as("p"), col("o_orderkey").as("k"))
        o.groupBy("o_orderpriority")
          .agg(min(sd).as("mn"), max(sd).as("mx"))
          .select(col("o_orderpriority"),
            col("mn.d").cast("timestamp_ntz").as("first_date"),
            col("mn.p").as("first_price"),
            col("mn.k").as("first_key"),
            col("mx.d").cast("timestamp_ntz").as("last_date"),
            col("mx.p").as("last_price"),
            col("mx.k").as("last_key"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        WITH g AS (
          SELECT o_orderpriority,
                 min(struct_pack(d := o_orderdate, p := o_totalprice,
                                 k := o_orderkey)) AS mn,
                 max(struct_pack(d := o_orderdate, p := o_totalprice,
                                 k := o_orderkey)) AS mx
          FROM orders GROUP BY 1)
        SELECT o_orderpriority,
               mn.d AS first_date, mn.p AS first_price, mn.k AS first_key,
               mx.d AS last_date, mx.p AS last_price, mx.k AS last_key
        FROM g ORDER BY o_orderpriority"""))
  )
}
