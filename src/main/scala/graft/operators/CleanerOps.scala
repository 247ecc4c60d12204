package graft.operators

import graft.{Q, Tables}
import graft.functions.Cleaners
import org.apache.spark.sql.functions._

/** The reference's cleaning layer (SURVEY.md §2.3 T1–T3) exercised as
  * oracle-checked queries. The reference applies these to OSM tag data; here
  * they run over deterministic synthetic strings built from star-schema
  * columns so the DuckDB oracle can rebuild the identical inputs.
  *
  * All three cleaners are pure expression chains (Cleaners.scala) — no UDFs,
  * whole-stage-codegen'd, and shuffle-free (narrow maps that scale linearly).
  */
object CleanerOps {

  val defs: Seq[Q] = Seq(

    // ---- T1: tag-key namespace split (py:87,117–126) ----
    Q("q28_key_split",
      """WITH k AS (
        |  SELECT p_partkey,
        |    CASE CAST(p_partkey % 5 AS INTEGER)
        |      WHEN 0 THEN lower(p_brand) || ':' || lower(p_type)
        |      WHEN 1 THEN lower(p_type)
        |      WHEN 2 THEN 'addr:' || lower(p_brand)
        |      WHEN 3 THEN 'cycleway:right:' || lower(p_type)
        |      ELSE 'CEMT:' || p_type END AS k
        |  FROM part)
        |SELECT p_partkey, k,
        |  CASE WHEN regexp_matches(k, '^([a-z]|_)+:([a-z]|_)+')
        |       THEN split_part(k, ':', 1) ELSE 'regular' END AS tag_type,
        |  CASE WHEN regexp_matches(k, '^([a-z]|_)+:([a-z]|_)+')
        |       THEN substr(k, strpos(k, ':') + 1) ELSE k END AS tag_key
        |FROM k ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val k = when(col("p_partkey") % 5 === 0,
          concat(lower(col("p_brand")), lit(":"), lower(col("p_type"))))
        .when(col("p_partkey") % 5 === 1, lower(col("p_type")))
        .when(col("p_partkey") % 5 === 2, concat(lit("addr:"), lower(col("p_brand"))))
        .when(col("p_partkey") % 5 === 3, concat(lit("cycleway:right:"), lower(col("p_type"))))
        .otherwise(concat(lit("CEMT:"), col("p_type")))
      Tables.t(s, d, "part")
        .select(col("p_partkey"), k.as("k"))
        .select(
          col("p_partkey"), col("k"),
          Cleaners.keyType(col("k")).as("tag_type"),
          Cleaners.keyTail(col("k")).as("tag_key"))
        .orderBy("p_partkey")
    },

    // ---- T3: NL phone normalization, all branches (py:131–146) ----
    Q("q29_phone_norm",
      """WITH v AS (
        |  SELECT o_orderkey,
        |    (CASE CAST(o_orderkey % 3 AS INTEGER)
        |       WHEN 0 THEN '+31 (0)' WHEN 1 THEN '020-' ELSE '' END)
        |    || substr('003120555123456', 1, CAST(7 + o_orderkey % 8 AS INTEGER)) AS phone_raw
        |  FROM orders WHERE o_orderkey <= 600),
        |d AS (SELECT o_orderkey, phone_raw,
        |        regexp_replace(phone_raw, '[^0-9]', '', 'g') AS dg FROM v)
        |SELECT o_orderkey, phone_raw,
        |  CASE WHEN length(dg) IN (11, 9) THEN '+' || dg
        |       WHEN length(dg) = 12 THEN '+' || substr(dg, 1, 2) || substr(dg, 4)
        |       WHEN length(dg) IN (10, 8) THEN '+31' || substr(dg, 2)
        |       WHEN length(dg) = 13 THEN '+' || substr(dg, 3)
        |       WHEN length(dg) = 7 THEN '+31' || dg
        |       ELSE dg END AS phone_norm
        |FROM d ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val prefix = when(col("o_orderkey") % 3 === 0, "+31 (0)")
        .when(col("o_orderkey") % 3 === 1, "020-")
        .otherwise("")
      val raw = concat(prefix,
        lit("003120555123456").substr(lit(1), (lit(7) + col("o_orderkey") % 8).cast("int")))
      Tables.t(s, d, "orders")
        .filter(col("o_orderkey") <= 600)
        .select(col("o_orderkey"), raw.as("phone_raw"))
        .withColumn("phone_norm", Cleaners.nlPhone(col("phone_raw")))
        .orderBy("o_orderkey")
    },

    // ---- T2: NL postcode normalization (py:128–129, unconditional) ----
    Q("q30_postcode_norm",
      """WITH v AS (
        |  SELECT c_custkey,
        |    (CASE WHEN c_custkey % 5 = 0 THEN ' ' ELSE '' END)
        |    || CAST(1000 + c_custkey % 9000 AS VARCHAR)
        |    || (CASE CAST(c_custkey % 3 AS INTEGER)
        |          WHEN 0 THEN '' WHEN 1 THEN ' ' ELSE '  ' END)
        |    || chr(CAST(65 + c_custkey % 26 AS INTEGER))
        |    || chr(CAST(65 + c_custkey % 7 AS INTEGER))
        |    || (CASE WHEN c_custkey % 7 = 0 THEN ' ' ELSE '' END) AS pc_raw
        |  FROM customer)
        |SELECT c_custkey, pc_raw,
        |  substr(ltrim(pc_raw), 1, 4) || ' ' || right(rtrim(pc_raw), 2) AS pc_norm
        |FROM v ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val raw = concat(
        when(col("c_custkey") % 5 === 0, " ").otherwise(""),
        (lit(1000) + col("c_custkey") % 9000).cast("string"),
        when(col("c_custkey") % 3 === 0, "").when(col("c_custkey") % 3 === 1, " ").otherwise("  "),
        expr("chr(65 + c_custkey % 26)"),
        expr("chr(65 + c_custkey % 7)"),
        when(col("c_custkey") % 7 === 0, " ").otherwise(""))
      Tables.t(s, d, "customer")
        .select(col("c_custkey"), raw.as("pc_raw"))
        .withColumn("pc_norm", Cleaners.nlPostcode(col("pc_raw")))
        .orderBy("c_custkey")
    },

    // ---- PII scrub: detect + redact emails and IPv4s before training.
    //      The documents fixture carries no PII, so the query plants a
    //      deterministic address pair per doc (both engines rebuild the
    //      identical augmented text — the q29/q30 convention) and the
    //      gate hashes the REDACTED text: a regex that over- or
    //      under-matches, or a replace that misses an occurrence, breaks
    //      the md5. Patterns avoid Java-only syntax (no possessive
    //      quantifiers, no backrefs) so RE2 and java.util.regex agree.
    //      Narrow per-row map, zero shuffle at any corpus size. ----
    Q("q122_pii_redact",
      """WITH aug AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' ||
        |  CAST(doc_id % 7 AS VARCHAR) || '.example.com or 10.' ||
        |  CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |  CAST((doc_id // 256) % 256 AS VARCHAR) || '.' ||
        |  CAST(doc_id % 250 AS VARCHAR) || ' end' AS t
        |  FROM documents),
        |r1 AS (SELECT doc_id,
        |  len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g') AS t1
        |  FROM aug),
        |r2 AS (SELECT doc_id, n_email,
        |  len(regexp_extract_all(t1,
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ip,
        |  regexp_replace(t1, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}',
        |    '<IP>', 'g') AS t2
        |  FROM r1)
        |SELECT doc_id, CAST(n_email AS INTEGER) AS n_email,
        |  CAST(n_ip AS INTEGER) AS n_ip, md5(t2) AS redacted_md5
        |FROM r2 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail"),
        (col("doc_id") % 7).cast("string"), lit(".example.com or 10."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (expr("doc_id DIV 256") % 256).cast("string"), lit("."),
        (col("doc_id") % 250).cast("string"), lit(" end"))
      Tables.t(s, d, "documents")
        .select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(emailRe)).as("n_email"),
          regexp_replace(col("t"), emailRe, "<EMAIL>").as("t1"))
        .select(col("doc_id"), col("n_email"),
          regexp_count(col("t1"), lit(ipRe)).as("n_ip"),
          regexp_replace(col("t1"), ipRe, "<IP>").as("t2"))
        .select(col("doc_id"), col("n_email"), col("n_ip"),
          md5(col("t2")).as("redacted_md5"))
        .orderBy("doc_id")
    },

    // ---- Unicode NFC normalization via the custom codegen'd
    //      NfcNormalize expression (Spark ships no normalizer; the §7.3
    //      preference order says Expression before UDF). Fixture plants
    //      DECOMPOSED text deterministically (every 'e' → e + combining
    //      acute U+0301); NFC recomposes to é, so lengths shrink back
    //      and the md5 pins JDK-NFC ≡ DuckDB/utf8proc-NFC — safe to
    //      gate cross-engine because canonical composition is covered
    //      by Unicode's normalization stability policy. The ASCII rest
    //      of each doc exercises the zero-alloc already-normalized fast
    //      path in the same pass. Narrow per-row map, zero shuffle. ----
    Q("q221_nfc_normalize",
      """WITH aug AS (SELECT doc_id,
        |  replace(text, 'e', 'e' || chr(769)) AS t FROM documents)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_before,
        |  CAST(length(nfc_normalize(t)) AS BIGINT) AS n_after,
        |  md5(nfc_normalize(t)) AS fp
        |FROM aug ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.plans.GraftFunctions.nfc
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          regexp_replace(col("text"), "e", "e\u0301").as("t"))
        .select(col("doc_id"),
          length(col("t")).cast("long").as("n_before"),
          length(nfc(col("t"))).cast("long").as("n_after"),
          md5(nfc(col("t"))).as("fp"))
        .orderBy("doc_id")
    }
  )
}
