package thrivespark.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import thrivespark.{Op, Tables => T}
import thrivespark.Det._

/** SURVEY.md §2.8 — scalar function surface (#41–#47).
  * Cross-engine gotchas handled here (SURVEY.md §7.4): ISO day-of-week on
  * both sides, decimal-based rounding (half-up in both engines), casts that
  * align DuckDB's BIGINT-returning date parts with Spark's INT. */
object Scalars {
  val ops: Seq[Op] = Seq(
    // r22 (guide §1.2/§2.3): fn_string/fn_string2/fn_date/fn_codec/fn_xml
    // sort AFTER the raw columns and project on top. The global orderBy's
    // range exchange runs a sampling pass that re-executes its child, so a
    // projection below the sort is evaluated TWICE (measured: fn_xml
    // 1.03–1.19 s → 0.78–0.85 s, fn_string2 0.49–0.65 → 0.34–0.52 s
    // steady, interleaved A/B) — and for these ops the derived row is as
    // wide as or wider than the raw inputs, so sorting the raw columns
    // also shrinks (or holds) the exchange bytes. Applies only where the
    // sort keys are raw unique PKs (p_partkey / o_orderkey): output order
    // and values are byte-identical (216/216 strict re-proven). fn_math /
    // fn_bitwise sort on their DERIVED columns (R1 total-order) and
    // fn_array / multimodal_join would push WIDER payload (embedding /
    // text) through the exchange — left alone, see OPTIMIZATION_r22.md.
    Op("fn_string",
      (s, d) => T.part(s, d).orderBy(col("p_partkey")).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(trim(col("p_name"))).as("name_len"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word_re"),
        split(col("p_name"), " ").getItem(0).as("first_word_split"),
        levenshtein(col("p_brand"), lit("Brand#1")).as("lev"),
        col("p_name").like("%ring%").cast("int").as("has_ring")),
      Some("""SELECT p_partkey,
                     upper(p_name) AS uname,
                     substring(p_name, 1, 5) AS prefix5,
                     concat_ws('|', p_brand, p_type) AS brand_type,
                     CAST(length(trim(p_name)) AS INTEGER) AS name_len,
                     regexp_extract(p_name, '^(\w+)', 1) AS first_word_re,
                     string_split(p_name, ' ')[1] AS first_word_split,
                     CAST(levenshtein(p_brand, 'Brand#1') AS INTEGER) AS lev,
                     CAST(p_name LIKE '%ring%' AS INTEGER) AS has_ring
              FROM part ORDER BY p_partkey""")),

    Op("fn_date",
      (s, d) => T.orders(s, d).orderBy(col("o_orderkey")).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        (weekday(col("o_orderdate")) + 1).as("isodow"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("eom"),
        unix_micros(col("o_orderdate")).as("epoch_us")),
      Some("""SELECT o_orderkey,
                     CAST(year(o_orderdate) AS INTEGER) AS y,
                     CAST(month(o_orderdate) AS INTEGER) AS m,
                     CAST(day(o_orderdate) AS INTEGER) AS dom,
                     CAST(date_part('isodow', o_orderdate) AS INTEGER) AS isodow,
                     CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
                     CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
                     CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
                     CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
                     epoch_us(o_orderdate) AS epoch_us
              FROM orders ORDER BY o_orderkey""")),

    Op("fn_math",
      (s, d) => T.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").as("price_r1"),
        abs(col("l_discount").cast("decimal(10,2)") - lit(0.05).cast("decimal(10,2)")).cast("double").as("disc_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        round6(log(col("l_quantity"))).as("ln_qty"),
        round6(sqrt(col("l_quantity"))).as("sqrt_qty"),
        pow(col("l_quantity"), 2).cast("long").as("qty_sq"))
        // R1: (orderkey, linenumber) not unique — order by every emitted
        // column so the output order is total.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_r1"),
                 col("disc_dev"), col("price_ceil"), col("price_floor"),
                 col("ln_qty"), col("sqrt_qty"), col("qty_sq")),
      Some("""SELECT l_orderkey, l_linenumber,
                     CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
                     CAST(abs(CAST(l_discount AS DECIMAL(10,2)) - CAST(0.05 AS DECIMAL(10,2))) AS DOUBLE) AS disc_dev,
                     CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
                     CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                     l_orderkey % 7 AS key_mod7,
                     round(ln(l_quantity), 6) AS ln_qty,
                     round(sqrt(l_quantity), 6) AS sqrt_qty,
                     CAST(pow(l_quantity, 2) AS BIGINT) AS qty_sq
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, price_r1, disc_dev,
                       price_ceil, price_floor, ln_qty, sqrt_qty, qty_sq""")),

    Op("fn_bitwise",
      (s, d) => T.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(lit(255))).as("k_and"),
        (col("l_orderkey").bitwiseOR(lit(16))).as("k_or"),
        (col("l_orderkey").bitwiseXOR(lit(255))).as("k_xor"),
        shiftleft(col("l_linenumber"), 2).cast("long").as("ln_shl"),
        shiftright(col("l_orderkey"), 3).as("k_shr"),
        bit_count(col("l_orderkey")).cast("int").as("k_bits"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ln_shl")),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_orderkey & 255 AS k_and,
                     l_orderkey | 16 AS k_or,
                     xor(l_orderkey, 255) AS k_xor,
                     CAST(l_linenumber << 2 AS BIGINT) AS ln_shl,
                     l_orderkey >> 3 AS k_shr,
                     CAST(bit_count(l_orderkey) AS INTEGER) AS k_bits
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, ln_shl""")),

    Op("fn_string2",
      (s, d) => T.part(s, d).orderBy(col("p_partkey")).select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "0").as("brand_pad"),
        rpad(col("p_type"), 10, ".").as("type_pad"),
        reverse(col("p_name")).as("name_rev"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"),
        instr(col("p_name"), "a").as("pos_a"),
        ascii(substring(col("p_name"), 1, 1)).as("first_ascii"),
        expr("right(p_name, 3)").as("name_r3"),
        repeat(substring(col("p_type"), 1, 2), 2).as("type_rep"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_tr")),
      Some("""SELECT p_partkey,
                     lpad(p_brand, 12, '0') AS brand_pad,
                     rpad(p_type, 10, '.') AS type_pad,
                     reverse(p_name) AS name_rev,
                     replace(p_name, ' ', '_') AS name_us,
                     CAST(position('a' in p_name) AS INTEGER) AS pos_a,
                     CAST(ascii(left(p_name, 1)) AS INTEGER) AS first_ascii,
                     right(p_name, 3) AS name_r3,
                     repeat(left(p_type, 2), 2) AS type_rep,
                     translate(p_name, 'aeiou', 'AEIOU') AS name_tr
              FROM part ORDER BY p_partkey""")),

    Op("fn_cond_case",
      (s, d) => T.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("band"),
        least(col("o_totalprice"), lit(100000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(100000.0)).as("floored"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_x"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                     CASE WHEN o_totalprice < 50000 THEN 'low'
                          WHEN o_totalprice < 150000 THEN 'mid'
                          ELSE 'high' END AS band,
                     least(o_totalprice, 100000.0) AS capped,
                     greatest(o_totalprice, 100000.0) AS floored,
                     coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x
              FROM orders ORDER BY o_orderkey""")),

    // Array surface over embeddings; element-wise math in DOUBLE on both
    // sides, sequential fold order → IEEE-identical.
    Op("fn_array",
      (s, d) => T.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round4(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")))).as("l2_norm"),
        round4(element_at(col("embedding"), 1).cast("double")).as("e1"),
        round4(element_at(col("embedding"), 2).cast("double")).as("e2"),
        round4(element_at(col("embedding"), 3).cast("double")).as("e3"),
        round4(element_at(col("embedding"), 4).cast("double")).as("e4"))
        .orderBy(col("vec_id")),
      Some("""SELECT vec_id,
                     CAST(len(embedding) AS INTEGER) AS dim,
                     round(sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
                     round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS e1,
                     round(CAST(embedding[2] AS DOUBLE), 4) + 0.0 AS e2,
                     round(CAST(embedding[3] AS DOUBLE), 4) + 0.0 AS e3,
                     round(CAST(embedding[4] AS DOUBLE), 4) + 0.0 AS e4
              FROM embeddings ORDER BY vec_id""")),

    // Generator over arrays: explode the first 3 embedding dims to
    // (vec_id, dim_idx, value) triples — the lateral-view surface on vectors.
    Op("fn_array_explode",
      (s, d) => T.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(slice(col("embedding"), 1, 3)).as(Seq("dim_idx", "v")))
        .select(col("vec_id"), col("dim_idx"),
          round(col("v").cast("double"), 4).as("v"))
        .orderBy(col("vec_id"), col("dim_idx")),
      Some("""SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim_idx,
                     round(CAST(embedding[i] AS DOUBLE), 4) + 0.0 AS v
              FROM embeddings, generate_series(1, 3) AS g(i)
              ORDER BY vec_id, dim_idx""")),

    // Map surface: build a map from parsed JSON, extract by key; only the
    // extracted scalar is emitted (map entry order is not hash-stable).
    Op("fn_map",
      (s, d) => T.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .withColumn("m", map(lit("k"), col("k")))
        .select(element_at(col("m"), "k").as("k_out"))
        .groupBy(col("k_out")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("k_out")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_out, count(*) AS cnt
              FROM events GROUP BY 1 ORDER BY 1""")),

    // Struct construction + field access + JSON serialization (both engines
    // emit the identical compact {"k":v} form for these types).
    Op("fn_struct_json",
      (s, d) => T.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .withColumn("st", struct(col("event_type"), col("k")))
        .select(col("event_id"), col("st.event_type").as("etype"),
          to_json(col("st")).as("as_json"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type AS etype,
                     to_json({'event_type': event_type,
                              'k': CAST(json_extract_string(props, '$.k') AS INTEGER)}) AS as_json
              FROM events ORDER BY event_id""")),

    // XML ingestion surface (Spark 4 native from_xml): the op builds the
    // XML from known columns, parses it back with the declared schema, and
    // emits the extracted fields — the oracle re-derives the same values by
    // regex-parsing the identical XML string, so the check exercises real
    // parsing on both sides rather than comparing constants. Map-only.
    Op("fn_xml",
      (s, d) => {
        val xml = concat(lit("<r><k>"), col("o_orderkey"),
          lit("</k><s>"), col("o_orderstatus"), lit("</s></r>"))
        val schema = StructType(Seq(
          StructField("k", org.apache.spark.sql.types.LongType),
          StructField("s", org.apache.spark.sql.types.StringType)))
        // r22: sort the (key, xml-string) rows, parse ABOVE the range
        // exchange — the sampling pass re-evaluated the from_xml parse
        // (see the family note on fn_string)
        T.orders(s, d)
          .select(col("o_orderkey"), xml.as("x"))
          .orderBy(col("o_orderkey"))
          .select(col("o_orderkey"), col("x"),
            from_xml(col("x"), schema).as("p"))
          .select(col("o_orderkey"), col("p.k").as("k"), col("p.s").as("s"),
            (col("p.k") === col("o_orderkey")).cast("int").as("parity"))
      },
      Some("""SELECT o_orderkey,
                     CAST(regexp_extract(x, '<k>([0-9]+)</k>', 1) AS BIGINT) AS k,
                     regexp_extract(x, '<s>([A-Z]+)</s>', 1) AS s,
                     CAST(CAST(regexp_extract(x, '<k>([0-9]+)</k>', 1) AS BIGINT)
                          = o_orderkey AS INTEGER) AS parity
              FROM (SELECT o_orderkey,
                           '<r><k>' || o_orderkey || '</k><s>' || o_orderstatus
                             || '</s></r>' AS x
                    FROM orders)
              ORDER BY o_orderkey""")),

    Op("fn_json",
      (s, d) => {
        // One parse per row: both extracted fields live in the same
        // from_json schema, so the JSON text is tokenized exactly once
        // (absent keys surface as nulls, matching json_extract_string).
        val schema = StructType(Seq(
          StructField("k", IntegerType),
          StructField("missing", org.apache.spark.sql.types.StringType)))
        T.events(s, d)
          .withColumn("j", from_json(col("props"), schema))
          .groupBy(col("j.k").as("k"))
          .agg(count(lit(1)).as("cnt"), count(col("j.missing")).as("n_missing_notnull"))
          .orderBy(col("k"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                     count(*) AS cnt,
                     count(json_extract_string(props, '$.missing')) AS n_missing_notnull
              FROM events GROUP BY 1 ORDER BY 1""")),

    // Binary codec surface: base64 / hex / round-trip decode — the
    // serialization functions every payload-bearing pipeline leans on.
    // hex case differs between engines (Spark upper, DuckDB upper too but
    // normalize anyway) — lower() both sides.
    Op("fn_codec",
      (s, d) => T.part(s, d).orderBy(col("p_partkey")).select(
        col("p_partkey"),
        base64(col("p_name").cast("binary")).as("b64"),
        lower(hex(col("p_name").cast("binary"))).as("hex_lc"),
        octet_length(unbase64(base64(col("p_name").cast("binary")))).as("rt_bytes")),
      Some("""SELECT p_partkey, base64(encode(p_name)) AS b64,
                     lower(hex(encode(p_name))) AS hex_lc,
                     CAST(octet_length(from_base64(base64(encode(p_name)))) AS INTEGER) AS rt_bytes
              FROM part ORDER BY p_partkey""")),
  )
}
