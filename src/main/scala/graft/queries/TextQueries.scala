package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface: per-language
  * stats, token counting, quality scoring, language-ID heuristic, document
  * fingerprinting, exact dedup. All built-ins (split/length/md5/agg) — no
  * UDFs, so the whole pipeline stays inside whole-stage codegen and
  * map-side partial aggregation. At 100 TB these are embarrassingly
  * parallel scans + one shuffle per groupBy.
  */
object TextQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_text_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("lang"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("sum_chars"),
            toDbl(intAvg(col("n_chars"))).as("avg_chars"),
            toDbl(intAvg(col("n_tokens"))).as("avg_tokens"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |CAST(CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS DECIMAL(38,6)) AS DOUBLE) AS avg_chars,
             |CAST(CAST(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(n_tokens) AS DECIMAL(38,6)) AS DOUBLE) AS avg_tokens
             |FROM (SELECT lang, n_chars,
             |      CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
             |      FROM documents) sub
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      "q_tokens_count",
      // Token counting two ways: whitespace split and a BPE-ish regex over
      // word/number/punctuation classes (SURVEY round-2 extension).
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("ws_tokens"),
            size(split(col("text"), "[a-z]+|[0-9]+|[^a-z0-9 ]"))
              .minus(1).cast("long").as("re_pieces"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS ws_tokens,
             |CAST(LEN(REGEXP_SPLIT_TO_ARRAY(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) - 1 AS BIGINT) AS re_pieces
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_chunk_overlap",
      // Document chunking: overlapping token windows (size 64, stride 32) —
      // the operator that feeds a tokenizer/packer at 100 TB. Pure
      // map-side: split once, explode the stride positions, slice the
      // materialized token array per chunk — no shuffle until the final
      // presentation sort, and the token array is computed once per row
      // (its own projection, so the explode's generator child stays cheap).
      // Short docs yield exactly one (possibly sub-size) chunk.
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0),
              greatest(size(col("toks")) - 1, lit(0)), lit(32))).as("pos"))
          .filter(col("pos") === 0 || col("pos") + 32 < size(col("toks")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            array_join(slice(col("toks"), col("pos") + 1, lit(64)), " ").as("chunk"),
            least(size(col("toks")) - col("pos"), lit(64)).cast("long").as("n_tokens"))
          .orderBy("doc_id", "pos"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |pos AS (
             |  SELECT doc_id, t, UNNEST(range(0, GREATEST(LEN(t), 1), 32)) AS pos
             |  FROM toks)
             |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             |  array_to_string(t[pos + 1 : pos + 64], ' ') AS chunk,
             |  CAST(LEAST(LEN(t) - pos, 64) AS BIGINT) AS n_tokens
             |FROM pos WHERE pos = 0 OR pos + 32 < LEN(t)
             |ORDER BY doc_id, pos""".stripMargin)),

    QueryDef(
      "q_text_quality",
      // Quality scoring: length, mean token length, stopword ratio,
      // non-alpha ratio — the standard pretraining-filter features.
      (s, dir) => {
        val toks = size(split(col("text"), " ")).cast("long")
        val alpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
        val stop = size(split(concat(lit(" "), col("text"), lit(" ")), " (the|a|of|and|in) "))
          .minus(1).cast("long")
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars_m"),
            toks.as("n_tokens"),
            toDbl((alpha.cast("double") / length(col("text")).cast("double"))
              .cast(Dec38)).as("alpha_ratio"),
            toDbl((stop.cast("double") / toks.cast("double")).cast(Dec38)).as("stop_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, LENGTH(text) AS n_chars_m,
             |CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             |CAST(CAST(CAST(LENGTH(REGEXP_REPLACE(text, '[^a-z]', '', 'g')) AS DOUBLE)
             |     / CAST(LENGTH(text) AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE) AS alpha_ratio,
             |CAST(CAST(CAST(LEN(REGEXP_SPLIT_TO_ARRAY(' ' || text || ' ', ' (the|a|of|and|in) ')) - 1 AS DOUBLE)
             |     / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE) AS stop_ratio
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_text_langid",
      // Language-ID heuristic: score = stopword-hit ratio; the corpus text
      // is synthetic so the interesting part is the operator shape
      // (deterministic per-doc score + argmax-style CASE), not linguistic
      // accuracy.
      (s, dir) => {
        val toks = size(split(col("text"), " ")).cast("long")
        val en = size(split(concat(lit(" "), col("text"), lit(" ")), " (the|a|of) "))
          .minus(1).cast("long")
        val ratio = (en.cast("double") / toks.cast("double")).cast(Dec38)
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), toDbl(ratio).as("en_score"),
            when(ratio > 0.05, "en").otherwise("other").as("guess"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
             |CAST(CAST(CAST(LEN(REGEXP_SPLIT_TO_ARRAY(' ' || text || ' ', ' (the|a|of) ')) - 1 AS DOUBLE)
             |     / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE) AS en_score,
             |CASE WHEN CAST(CAST(LEN(REGEXP_SPLIT_TO_ARRAY(' ' || text || ' ', ' (the|a|of) ')) - 1 AS DOUBLE)
             |     / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS DECIMAL(38,6)) > 0.05
             |     THEN 'en' ELSE 'other' END AS guess
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_doc_fingerprint",
      // Content fingerprinting via md5 (identical across engines) — the
      // join-key form of exact dedup used to cluster identical docs.
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("fp"),
            substring(md5(col("text")), 1, 8).as("fp8"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, MD5(text) AS fp, SUBSTRING(MD5(text), 1, 8) AS fp8
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_dedup_exact",
      // Exact dedup at scale = hash-groupBy on the content key: one shuffle,
      // map-side combine. Keeps the smallest doc_id per distinct text.
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text")).as("fp"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .select("keep_id", "n_copies", "fp")
          .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, MD5(text) AS fp
             |FROM documents GROUP BY MD5(text) ORDER BY keep_id""".stripMargin)),

    QueryDef(
      "q_dup_rate_by_source",
      // Per-source duplication audit (r10) — the first corpus-health
      // number a crawl-mix owner asks for: how much of each source is
      // exact-duplicate mass? One hash-groupBy on (source, md5(text))
      // with map-side combine, then a per-source rollup — both keyed
      // shuffles, no distinct-within-agg at the raw-row level. dup_rate
      // = 1 - distinct/total as one IEEE division of exact longs,
      // identical both engines.
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("source"), md5(col("text")).as("fp"))
          .agg(count(lit(1)).as("copies"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_distinct"),
            sum("copies").as("n_docs"),
            sum(when(col("copies") > 1, col("copies")).otherwise(0L))
              .as("n_duplicated"))
          .select(col("source"), col("n_docs"), col("n_distinct"),
            col("n_duplicated"),
            (lit(1.0) - col("n_distinct").cast("double") / col("n_docs").cast("double"))
              .as("dup_rate"))
          .orderBy("source"),
      Some("""WITH fps AS (
             |  SELECT source, MD5(text) AS fp, COUNT(*) AS copies
             |  FROM documents GROUP BY 1, 2)
             |SELECT source, CAST(SUM(copies) AS BIGINT) AS n_docs,
             |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
             |  CAST(SUM(CASE WHEN copies > 1 THEN copies ELSE 0 END) AS BIGINT) AS n_duplicated,
             |  1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(copies) AS DOUBLE) AS dup_rate
             |FROM fps GROUP BY source ORDER BY source""".stripMargin)),

    QueryDef(
      "q_lang_mix",
      // Per-source language composition + Shannon entropy (r10) — the
      // cross-lingual contamination / mix-balance audit a multilingual
      // corpus runs before choosing sampling weights. Two keyed aggs
      // ((source, lang) → source); share is one exact-long IEEE division;
      // the entropy SUM rides note 29's truncated 2^30 fixed point so the
      // cross-language addition order can never flip a bit (each
      // -p·ln(p) term is the same IEEE double on both engines, like
      // q_cooccur_pmi's log mirror).
      (s, dir) => {
        val byLang = t(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("n_lang"))
        val bySource = byLang.groupBy("source")
          .agg(sum("n_lang").as("n_docs"), count(lit(1)).as("n_langs"))
        val p = col("n_lang").cast("double") / col("n_docs").cast("double")
        byLang.join(bySource, "source")
          .withColumn("term_fx",
            ((-p * log(p)) * 1073741824.0).cast("long"))
          .groupBy(col("source"), col("n_docs"), col("n_langs"))
          .agg(max(struct(col("n_lang"), col("lang"))).as("top"),
            sum("term_fx").as("h_fx"))
          .select(col("source"), col("n_docs"), col("n_langs"),
            col("top.lang").as("top_lang"),
            (col("top.n_lang").cast("double") / col("n_docs").cast("double"))
              .as("top_share"),
            (col("h_fx").cast("double") / 1073741824.0).as("entropy"))
          .orderBy("source")
      },
      Some("""WITH bl AS (
             |  SELECT source, lang, COUNT(*) AS n_lang
             |  FROM documents GROUP BY 1, 2),
             |bs AS (
             |  SELECT source, CAST(SUM(n_lang) AS BIGINT) AS n_docs,
             |    CAST(COUNT(*) AS BIGINT) AS n_langs
             |  FROM bl GROUP BY 1),
             |terms AS (
             |  SELECT bl.source, bs.n_docs, bs.n_langs, bl.n_lang,
             |    CAST(trunc((-(CAST(bl.n_lang AS DOUBLE) / CAST(bs.n_docs AS DOUBLE)) *
             |      LN(CAST(bl.n_lang AS DOUBLE) / CAST(bs.n_docs AS DOUBLE))) * 1073741824.0) AS BIGINT) AS term_fx
             |  FROM bl JOIN bs USING (source)),
             |top AS (
             |  SELECT source, lang, n_lang,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_lang DESC, lang DESC) AS rk
             |  FROM bl)
             |SELECT t.source, t.n_docs, t.n_langs, top.lang AS top_lang,
             |  CAST(top.n_lang AS DOUBLE) / CAST(t.n_docs AS DOUBLE) AS top_share,
             |  CAST(SUM(t.term_fx) AS DOUBLE) / 1073741824.0 AS entropy
             |FROM terms t JOIN top ON top.source = t.source AND top.rk = 1
             |GROUP BY t.source, t.n_docs, t.n_langs, top.lang, top.n_lang
             |ORDER BY t.source""".stripMargin)),

    QueryDef(
      "q_tfidf",
      // TF-IDF: per-(doc, term) frequency × ln(N/df). Three aggregates
      // (tf, df, corpus count) joined on term; the 1-row corpus count is
      // broadcast — no driver-side collect. At 100 TB the df table is the
      // only global structure and it's a plain shuffled agg.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // df derives from tf, not from the raw token stream: tf rows are
        // distinct (doc, term) by construction, so df(term) is a plain
        // count over the ALREADY-AGGREGATED table — no second explode, no
        // two-phase countDistinct over every token in the corpus. At 100 TB
        // the raw token stream is the biggest intermediate in the whole
        // pipeline; aggregating it once and reusing that is the only shape
        // that holds up. The count is phrased over the `tf` column (always
        // ≥ 1, so sum of the predicate ≡ count) to keep this subtree
        // byte-identical to the join's tf side — otherwise column pruning
        // rewrites it to a bare distinct and ReusedExchange cannot share
        // the explode + (doc, term) shuffle between the two branches.
        val dft = tf.groupBy("term")
          .agg(sum((col("tf") >= 1).cast("long")).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        tf.join(dft, "term").crossJoin(broadcast(n))
          .withColumn("tfidf",
            toDbl(round(col("tf") * log(col("n").cast("double") / col("df").cast("double")), 6)
              .cast(Dec38)))
          .select("doc_id", "term", "tfidf")
          .orderBy("doc_id", "term")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents)
             |SELECT doc_id, term,
             |  CAST(CAST(ROUND(tf * ln(CAST(n.n AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS DECIMAL(38,6)) AS DOUBLE) AS tfidf
             |FROM tf JOIN df USING (term), n
             |ORDER BY doc_id, term""".stripMargin)),

    QueryDef(
      "q_sample_hash",
      // Deterministic hash-based sampling (~12.5% here): the data-mixing
      // primitive for training-corpus composition. Unlike sample()/sampleBy
      // (partitioning-dependent RNG), an md5-prefix threshold is a pure
      // function of the row key — stable across engines, partitionings and
      // reruns, and trivially stratifiable by keying on (source, doc_id).
      // Fixed-width lowercase hex compares lexicographically = numerically.
      (s, dir) =>
        graft.operators.Ops.sampleByHash(
            t(s, dir, "documents"), col("doc_id"), hexThreshold = "2000")
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '2000'
             |ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_sample_weighted",
      // Importance-weighted deterministic sampling: keep probability
      // p_i = 0.5 · n_chars/max(n_chars) — the quality-score-proportional
      // selection a pretraining pipeline runs after scoring (longer/
      // higher-quality docs kept more often), WITHOUT RNG: each row's
      // md5-prefix u_i (8 hex digits) is compared against a per-row
      // threshold hex string derived from p_i by identical IEEE
      // floor/multiply on both engines. Map-side except the 1-row max
      // broadcast; stable across engines/partitionings/reruns like every
      // sampler here.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val maxc = docs.agg(max(col("n_chars")).cast("double").as("maxc"))
        docs.crossJoin(broadcast(maxc))
          .withColumn("thresh", lower(lpad(hex(
            floor(lit(0.5) * col("n_chars").cast("double") / col("maxc")
              * 4294967296.0).cast("long")), 8, "0")))
          .filter(substring(md5(col("doc_id").cast("string")), 1, 8) < col("thresh"))
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      },
      Some("""WITH m AS (SELECT CAST(MAX(n_chars) AS DOUBLE) AS maxc FROM documents)
             |SELECT doc_id, lang, n_chars FROM documents, m
             |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
             |  lower(lpad(hex(CAST(FLOOR(0.5 * CAST(n_chars AS DOUBLE) / maxc
             |    * 4294967296.0) AS BIGINT)), 8, '0'))
             |ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_corpus_prepare",
      // The end-to-end training-data preparation composite: exact dedup
      // (keep smallest doc_id per md5), quality filter (length + alpha
      // ratio), then per-doc token counts — the filter→dedup→tokenize
      // chain every pretraining pipeline runs. One shuffle (the dedup
      // groupBy); the rest is embarrassingly parallel scan work.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keep = docs
          .groupBy(md5(col("text")).as("fp"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        docs.join(keep, "doc_id")
          .filter(length(col("text")) >= 100)
          .filter(
            length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
              / length(col("text")).cast("double") > 0.5)
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH keep AS (
             |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text))
             |SELECT d.doc_id, d.lang,
             |       CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS n_tokens
             |FROM documents d JOIN keep USING (doc_id)
             |WHERE LENGTH(d.text) >= 100
             |  AND CAST(LENGTH(REGEXP_REPLACE(d.text, '[^a-z]', '', 'g')) AS DOUBLE)
             |      / CAST(LENGTH(d.text) AS DOUBLE) > 0.5
             |ORDER BY d.doc_id""".stripMargin)),

    QueryDef(
      "q_multimodal_features",
      // Full multimodal plumbing through the engine: binary payload →
      // per-partition batch decode → typed feature rows, now ORACLE-
      // CHECKABLE (r11, the twin-gate recipe): three PLANTED decodable
      // payloads (known-pixel PNG, hand-assembled PCM WAV, the r8 pinned-
      // IDCT JPEG — graft.functions.MultimodalFixtures) ride the same
      // scan union-ed at shifted doc_ids, and the declared row pins the
      // REAL codec outputs as booleans: the PNG/WAV feature vectors must
      // equal the arrays computed by replicating the decoder's exact
      // integer/float math, the JPEG mean/variance must equal the pinned
      // constants, and every corpus doc (text bytes) must take the
      // labeled stub path. All aggregation happens inside the returned
      // frame — no driver action; the per-doc feature detail stays
      // DedupSpec-covered.
      (s, dir) => {
        import s.implicits._
        val F = graft.functions.MultimodalFixtures
        val payloads = graft.functions.Multimodal.asBinaryPayload(t(s, dir, "documents"))
        val off = 10000000L
        val planted = Seq(
            (off + 1, F.png4x2), (off + 2, F.wav4), (off + 3, F.jpeg16x8))
          .toDF("doc_id", "payload")
          .withColumn("content_type", lit("application/octet-stream"))
        graft.functions.Multimodal
          .extractFeatures(payloads.unionByName(planted))
          .agg(
            sum(when(col("doc_id") < off, 1L).otherwise(0L)).as("n_docs"),
            sum(when(col("doc_id") < off && col("format") === "stub", 1L)
              .otherwise(0L)).as("n_stub"),
            max(when(col("doc_id") === off + 1,
              col("format") === "png" &&
                col("features") === typedLit(F.png4x2Features.toSeq)))
              .as("png_ok"),
            max(when(col("doc_id") === off + 2,
              col("format") === "wav" &&
                col("features") === typedLit(F.wav4Features.toSeq)))
              .as("wav_ok"),
            max(when(col("doc_id") === off + 3,
              col("format") === "jpeg" &&
                element_at(col("features"), 1) === lit(16f) &&
                element_at(col("features"), 2) === lit(8f) &&
                element_at(col("features"), 3) === lit(F.Jpeg16x8PinnedMean) &&
                element_at(col("features"), 4) === lit(F.Jpeg16x8PinnedVar)))
              .as("jpeg_ok"))
          .select(col("n_docs"), (col("n_stub") === col("n_docs")).as("stub_all"),
            col("png_ok"), col("wav_ok"), col("jpeg_ok"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS stub_all,
             |TRUE AS png_ok, TRUE AS wav_ok, TRUE AS jpeg_ok
             |FROM documents""".stripMargin)),

    QueryDef(
      "q_multimodal_resize",
      // Resize plumbing through the declared surface: binary payload →
      // fixed-geometry buffer per doc (graft.functions.Multimodal.resize —
      // REAL exact-integer area-average resample for raster payloads,
      // labeled byte-sampling stub for this text-bytes corpus; identical
      // per-partition executor iteration on both paths). ORACLE-CHECKABLE
      // (r11): the known-pixel 4×2 PNG rides the scan at a shifted id and
      // the declared row pins its 8×4 area-average buffer byte-for-byte
      // against the expected array (upscale maps each output cell onto
      // one source pixel), plus the fixed output geometry over the whole
      // corpus. Per-doc buffer detail stays DedupSpec-covered.
      (s, dir) => {
        import s.implicits._
        val F = graft.functions.MultimodalFixtures
        val payloads = graft.functions.Multimodal.asBinaryPayload(t(s, dir, "documents"))
        val off = 10000000L
        val planted = Seq((off + 1, F.png4x2)).toDF("doc_id", "payload")
          .withColumn("content_type", lit("application/octet-stream"))
        graft.functions.Multimodal.resize(payloads.unionByName(planted), 8, 4)
          .agg(
            sum(when(col("doc_id") < off, 1L).otherwise(0L)).as("n_docs"),
            min(col("width") === 8 && col("height") === 4 &&
              length(col("pixels")) === 32).as("geometry_ok"),
            max(when(col("doc_id") === off + 1,
              col("pixels") === lit(F.png4x2Thumb8x4))).as("png_resize_ok"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS geometry_ok,
             |TRUE AS png_resize_ok FROM documents""".stripMargin)),

    QueryDef(
      "q_multimodal_frames",
      // Frame sampling: every-2nd frame per payload, one row per sampled
      // frame (the flatMap shape of video keyframe extraction). The demux
      // is REAL for GIF payloads (r10 — the JDK's multi-frame reader +
      // exact-integer 8×8 luma thumbs) and the labeled 100-byte-slicing
      // stub for everything else, this text-bytes corpus included.
      // ORACLE-CHECKABLE (r11): a real 3-frame animated GIF (solid grays,
      // palette-quantization-proof) rides the scan at a shifted id; the
      // declared row counts the corpus's stub frames (every-2nd of
      // ceil(bytes/100) chunks — mirrored arithmetically in DuckDB) and
      // pins the demux: exactly frames 0 and 2 sampled, both via the real
      // gif path, thumbs byte-for-byte all-10 / all-200.
      (s, dir) => {
        import s.implicits._
        val F = graft.functions.MultimodalFixtures
        val payloads = graft.functions.Multimodal.asBinaryPayload(t(s, dir, "documents"))
        val off = 10000000L
        val planted = Seq((off + 1, F.gif3)).toDF("doc_id", "payload")
          .withColumn("content_type", lit("application/octet-stream"))
        graft.functions.Multimodal
          .frameSample(payloads.unionByName(planted), frameSize = 100, everyN = 2)
          .agg(
            sum(when(col("doc_id") < off, 1L).otherwise(0L)).as("n_frames"),
            min(when(col("doc_id") < off, col("format") === "stub"))
              .as("stub_all"),
            sum(when(col("doc_id") === off + 1, 1L).otherwise(0L)).as("gifn"),
            max(when(col("doc_id") === off + 1 && col("frame_idx") === 0,
              col("format") === "gif" &&
                col("frame") === lit(Array.fill[Byte](64)(F.GifGrays(0).toByte))))
              .as("g0"),
            max(when(col("doc_id") === off + 1 && col("frame_idx") === 2,
              col("format") === "gif" &&
                col("frame") === lit(Array.fill[Byte](64)(F.GifGrays(2).toByte))))
              .as("g2"))
          .select(col("n_frames"), col("stub_all"),
            (col("gifn") === 2L && col("g0") && col("g2")).as("gif_demux_ok"))
      },
      Some("""SELECT CAST(SUM((CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 100.0)
             |    AS BIGINT) + 1) // 2) AS BIGINT) AS n_frames,
             |TRUE AS stub_all, TRUE AS gif_demux_ok
             |FROM documents""".stripMargin)),

    QueryDef(
      "q_sample_stratified",
      // Stratified deterministic sampling: per-language rates (en 25%,
      // others 6.25%) via the same md5-prefix threshold as q_sample_hash —
      // the corpus-mixing primitive with per-source weights, stable across
      // engines and partitionings (unlike sampleBy's RNG).
      (s, dir) =>
        graft.operators.Ops.sampleStratified(
            t(s, dir, "documents"), col("doc_id"), col("lang"),
            rates = Map("en" -> "4000"), default = "1000")
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
             |      CASE WHEN lang = 'en' THEN '4000' ELSE '1000' END
             |ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_multimodal_meta",
      // Multimodal plumbing: treat content as an opaque binary column with
      // typed metadata (SURVEY round-2 extension; the container has no
      // image/audio codecs, so decode itself is stubbed in
      // graft.functions.Multimodal — here the compared surface is the real
      // Spark-side schema/partitioning plumbing: binary payload, byte
      // length, hex prefix).
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"),
            octet_length(encode(col("text"), "UTF-8")).cast("long").as("nbytes"),
            hex(substring(encode(col("text"), "UTF-8"), 1, 8)).as("prefix_hex"))
          .select("doc_id", "nbytes", "prefix_hex")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS nbytes,
             |HEX(ENCODE(SUBSTRING(text, 1, 8))) AS prefix_hex
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_text_pii_scrub",
      // PII redaction pass (the C4/RefinedWeb-style cleanup step): emails
      // and phone-shaped digit runs become typed placeholder tokens.
      // Pure map-side regexp work in whole-stage codegen — zero shuffle at
      // any corpus size. The redaction count is recomputed from the SOURCE
      // text so every row carries its own audit signal. Regexes stay in
      // the character-class subset Java regex and RE2 (DuckDB) agree on.
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
        t(s, dir, "documents")
          .select(col("doc_id"),
            regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
              phone, "<PHONE>").as("clean_text"),
            (size(regexp_extract_all(col("text"), lit(email), lit(0))) +
              size(regexp_extract_all(col("text"), lit(phone), lit(0))))
              .cast("long").as("n_redactions"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |               '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS clean_text,
             |CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |   + LEN(regexp_extract_all(text, '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS n_redactions
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_text_repetition",
      // Gopher-style repetition signals: distinct-token ratio and the
      // share of the single most-frequent token — the filter that drops
      // degenerate/boilerplate documents before pretraining. One exploded
      // (doc, token) exchange with map-side partial counts; the per-doc
      // rollup reuses the same partitioning.
      (s, dir) => {
        val freq = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        freq.groupBy("doc_id")
          .agg(sum("c").cast("long").as("n_tokens"),
            count(lit(1)).as("n_unique"),
            max("c").as("max_c"))
          .select(col("doc_id"), col("n_tokens"), col("n_unique"),
            toDbl((col("n_unique").cast("double") / col("n_tokens"))
              .cast(Dec38)).as("uniq_ratio"),
            toDbl((col("max_c").cast("double") / col("n_tokens"))
              .cast(Dec38)).as("top_share"))
          .withColumn("keep", col("uniq_ratio") >= 0.05 && col("top_share") <= 0.2)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |COUNT(*) AS n_unique,
             |CAST(CAST(CAST(COUNT(*) AS DOUBLE) / SUM(c) AS DECIMAL(38,6)) AS DOUBLE) AS uniq_ratio,
             |CAST(CAST(CAST(MAX(c) AS DOUBLE) / SUM(c) AS DECIMAL(38,6)) AS DOUBLE) AS top_share,
             |(CAST(CAST(CAST(COUNT(*) AS DOUBLE) / SUM(c) AS DECIMAL(38,6)) AS DOUBLE) >= 0.05
             |  AND CAST(CAST(CAST(MAX(c) AS DOUBLE) / SUM(c) AS DECIMAL(38,6)) AS DOUBLE) <= 0.2) AS keep
             |FROM (SELECT doc_id, tok, COUNT(*) AS c FROM
             |  (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents) u
             |  GROUP BY doc_id, tok) f
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_corpus_shuffle",
      // Deterministic global shuffle + shard assignment for training-data
      // ordering: shuffle_key = md5(doc_id) decorrelates neighbors (docs
      // adjacent in the source are scattered across the epoch), shard is
      // the key's first hex nibble (16 shards here; a longer prefix at
      // real scale). A pure function of doc_id — identical across engines,
      // partitionings and reruns, unlike seeded-RNG shuffles. At 100 TB
      // the ORDER BY is a range-partitioned sort on a uniform key (every
      // partition gets an equal slice — no skew by construction) and the
      // shard column is what a writer partitions output files by.
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            md5(col("doc_id").cast("string")).as("shuffle_key"))
          .withColumn("shard",
            (expr("instr('0123456789abcdef', substring(shuffle_key, 1, 1))") - 1)
              .cast("long"))
          .orderBy("shuffle_key", "doc_id"),
      Some("""SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
             |CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS shard
             |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin)),

    QueryDef(
      "q_pack_sequences",
      // Training-sequence packing: documents are concatenated in shuffle
      // order into a per-shard token stream and cut into fixed 2048-token
      // windows (GPT-style pretraining packing — docs straddle window
      // boundaries). Each doc's placement is (shard, start_off) from a
      // running token sum, then seq_index = start_off / 2048 and
      // seq_off = start_off % 2048 locate it inside its window. The
      // running sum is windowed WITHIN each hash shard — 16 independent
      // cumsums here, thousands at real scale — never a single global
      // partition, which is what makes packing distributable at 100 TB.
      (s, dir) => {
        val seqLen = 2048L
        val base = t(s, dir, "documents")
          .select(col("doc_id"),
            md5(col("doc_id").cast("string")).as("sk"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("shard",
            (expr("instr('0123456789abcdef', substring(sk, 1, 1))") - 1).cast("long"))
        val w = Window.partitionBy("shard").orderBy("sk", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base
          .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
          .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_off"),
            floor(col("start_off") / seqLen).as("seq_index"),
            (col("start_off") % seqLen).as("seq_off"))
          .orderBy("shard", "start_off", "doc_id")
      },
      Some("""SELECT doc_id, shard, n_tokens, CAST(start_off AS BIGINT) AS start_off,
             |CAST(start_off // 2048 AS BIGINT) AS seq_index, CAST(start_off % 2048 AS BIGINT) AS seq_off
             |FROM (
             |  SELECT doc_id, shard, n_tokens,
             |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY sk, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
             |  FROM (
             |    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sk,
             |      CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             |      CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS shard
             |    FROM documents) b) p
             |ORDER BY shard, start_off, doc_id""".stripMargin)),

    QueryDef(
      "q_pack_bins",
      // SAMPLE-INTACT batch packing (the fine-tuning counterpart of
      // q_pack_sequences' straddling concatenation): every doc stays
      // whole, bins have a fixed 2048-token capacity, and the packer is
      // HARMONIC bin packing — class k holds docs where exactly k fit
      // per bin (k = ⌊L/n⌋), so assignment inside a class is pure
      // arithmetic on the class-local rank (bin = rank div k) with a
      // provable ≈1.69× waste bound. Fully distributed: the class-local
      // rank comes from Ops.rankExact — sampled-CDF range partitioning on
      // the full (k, n DESC, doc_id) composite, so a class holding half
      // the corpus (real doc-length distributions concentrate in a few k)
      // still spreads over many tasks — NOT a Window.partitionBy("k"),
      // which funnels each class through ONE task (the r17 verdict's weak
      // mark); no global window, no sequential first-fit walk, which is
      // what makes sample-intact packing distributable at 100 TB. Census
      // per class: docs, bins FROM THE ACTUAL ASSIGNMENT (countDistinct
      // bin, gated against the ⌈n/k⌉ formula by `bins_ok`) and the fill
      // ratio.
      (s, dir) => {
        val L = 2048L
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            least(size(split(col("text"), " ")).cast("long"), lit(L)).as("n"))
          .withColumn("k", floor(lit(L.toDouble) / col("n")).cast("long"))
        val packed = graft.operators.Ops
          .rankExact(d, Seq("k"), Seq(col("n").desc, col("doc_id").asc), "rnk")
          .withColumn("bin", floor((col("rnk") - 1) / col("k")).cast("long"))
        packed.groupBy("k")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("bin")).as("n_bins"),
            sum(col("n")).as("tok"))
          .withColumn("bins_ok",
            col("n_bins") === expr("(n_docs + k - 1) div k"))
          // plain double division on EXACT integer inputs (tok is an
          // integer sum): correctly rounded and bit-identical in both
          // engines — a decimal(38,6) round-trip would land the
          // power-of-two denominators exactly on rounding half-boundaries
          .withColumn("fill_pct",
            col("tok").cast("double") * 100.0 /
              (col("n_bins") * L).cast("double"))
          .select(col("k"), col("n_docs"), col("n_bins"), col("bins_ok"),
            col("fill_pct"))
          .orderBy("k")
      },
      Some("""WITH d AS (SELECT doc_id,
             |  LEAST(CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT), 2048) AS n
             |  FROM documents),
             |c AS (SELECT CAST(FLOOR(2048.0 / n) AS BIGINT) AS k,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n) AS BIGINT) AS tok FROM d GROUP BY 1)
             |SELECT k, n_docs, CAST((n_docs + k - 1) // k AS BIGINT) AS n_bins,
             |  TRUE AS bins_ok,
             |  CAST(tok AS DOUBLE) * 100.0 /
             |    CAST(((n_docs + k - 1) // k) * 2048 AS DOUBLE) AS fill_pct
             |FROM c ORDER BY k""".stripMargin),
      // r18 replaced the per-class rank window (one task per harmonic
      // class) with the Ops.rankExact distributed rank — the r17 best
      // measured the unscalable shape
      shapeVersion = 2),

    QueryDef(
      "q_bm25",
      // BM25 (k1=1.2, b=0.75) relevance scores per (doc, term) — the
      // retrieval-scoring upgrade of q_tfidf and the ranking primitive for
      // corpus search / RAG-style selection. Same scale shape as tfidf:
      // ONE explode→(doc,term) aggregation whose exchange is shared by the
      // df branch (the biggest intermediate at 100 TB is aggregated once),
      // doc lengths are a map-side projection, and the 1-row corpus stats
      // frame is broadcast. The ln/ratio formula is mirrored token-for-token
      // in the oracle (every op correctly rounded on identical integer
      // inputs ⇒ bit-identical doubles), then rounded per the OUTPUT-TYPE
      // contract.
      (s, dir) => {
        // Explicit doc_id-not-null at the source: the dl join infers
        // IsNotNull(doc_id) on the tf branch only, which would make the
        // shared explode+agg subtrees canonically DIFFERENT and defeat
        // AQE exchange reuse (the df branch would re-run the corpus
        // explode). A no-op filter (doc_id is never null) restores
        // byte-identical subtrees. PlanSpec pins the runtime reuse.
        val docs = t(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
        val toks = docs.select(col("doc_id"), explode(col("toks")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // df off the already-aggregated tf table (see q_tfidf: phrased over
        // `tf` so ReusedExchange shares the explode+shuffle with the join).
        val dft = tf.groupBy("term").agg(sum((col("tf") >= 1).cast("long")).as("df"))
        val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("totdl"))
        val tfD = col("tf").cast("double")
        val dfD = col("df").cast("double")
        val nD = col("n").cast("double")
        tf.join(dft, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
          .withColumn("avgdl", col("totdl").cast("double") / nD)
          .withColumn("idf", log((nD - dfD + 0.5) / (dfD + 0.5) + 1.0))
          .withColumn("bm25", toDbl(
            round(col("idf") * (tfD * (lit(1.2) + 1.0)) /
              (tfD + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl").cast("double") / col("avgdl"))), 6)
              .cast(Dec38)))
          .select("doc_id", "term", "bm25")
          .orderBy("doc_id", "term")
      },
      Some("""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
             |toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n, SUM(dl) AS totdl FROM dl)
             |SELECT doc_id, term,
             |  CAST(CAST(ROUND(
             |    ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
             |    * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
             |    / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(totdl AS DOUBLE) / CAST(n AS DOUBLE)))),
             |    6) AS DECIMAL(38,6)) AS DOUBLE) AS bm25
             |FROM tf JOIN df USING (term) JOIN dl USING (doc_id), st
             |ORDER BY doc_id, term""".stripMargin)),

    QueryDef(
      "q_decontaminate",
      // Train/eval decontamination: flag held-out (eval) documents sharing
      // any word 3-gram with the training split — the standard benchmark-
      // contamination check a training pipeline runs before every release.
      // Split is a pure function of doc_id (md5-prefix < '1000' ≈ 6.25%
      // eval), so it is stable across engines/partitionings; candidates
      // come from an inverted-index equi-join on the gram (shuffle on gram,
      // never eval×train all-pairs). At 100 TB the same plan runs on hashed
      // 13-grams (HashExpressions.shingleHashes — longs, not strings) with
      // a hot-gram frequency cap; literal 3-gram strings here keep the
      // oracle engine-portable.
      (s, dir) => {
        val gramArrays = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            transform(sequence(lit(0), size(col("toks")) - 3),
              i => concat_ws(" ",
                element_at(col("toks"), i + 1),
                element_at(col("toks"), i + 2),
                element_at(col("toks"), i + 3))).as("gs"))
        // per-doc distinct inside the row — no global DISTINCT shuffle
        val grams = gramArrays.select(col("doc_id"),
          substring(md5(col("doc_id").cast("string")), 1, 4).as("sk"),
          explode_outer(array_distinct(col("gs"))).as("g"))
        val evalG = grams.filter(col("sk") < "1000")
          .select(col("doc_id").as("eval_id"), col("g"))
        val trainG = grams.filter(col("sk") >= "1000")
          .select(col("doc_id").as("train_id"), col("g"))
        evalG.join(trainG, "g")
          .groupBy("eval_id")
          .agg(countDistinct(col("g")).as("n_shared_grams"),
            countDistinct(col("train_id")).as("n_train_docs"))
          .orderBy("eval_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |  WHERE len(string_split(text, ' ')) >= 3),
             |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
             |grams AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM idx),
             |tagged AS (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sk, g FROM grams)
             |SELECT e.doc_id AS eval_id, CAST(count(DISTINCT e.g) AS BIGINT) AS n_shared_grams,
             |  CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs
             |FROM tagged e JOIN tagged tr ON e.g = tr.g
             |WHERE e.sk < '1000' AND tr.sk >= '1000'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_decontaminate_bloom",
      // Decontamination, the ZERO-SHUFFLE way: q_decontaminate's
      // inverted-index join shuffles every (gram, doc) pair; at 100 TB the
      // right plan inverts the asymmetry — the EVAL side is tiny, so build
      // a Bloom filter over eval's gram set (functions/BloomSketch — the
      // filter is DATA, built by a distributed aggregate, broadcast as a
      // 1-row frame; no driver-side collect) and flag TRAIN docs entirely
      // map-side: every gram test runs inside the scan's codegen span, so
      // the only corpus-side exchange is the slim per-doc flag census
      // (map-combined to one (doc_id, bool, bool) row per doc — grams of a
      // doc are colocated by construction). Grams are winnowing-
      // sampled at 1/16 density (md5-prefix lottery on the GRAM — engine-
      // portable, alignment-robust) so both the bloom keys and the per-doc
      // test count shrink 16x; the exact twin (broadcast join on the same
      // sampled grams) runs beside it for the audit. Declared gates:
      // n_train / n_contaminated_exact (oracle-compared), bloom_superset
      // (no exact-contaminated doc escapes the bloom — structural: Bloom
      // filters have NO false negatives) and bloom_fp_ok (false-positive
      // docs ≤ 1% of train — at 4 bloom tests/doc against a 2e-9/test FP
      // rate here, the observed overcount is 0).
      (s, dir) => {
        val gramArrays = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            transform(sequence(lit(0), size(col("toks")) - 3),
              i => concat_ws(" ",
                element_at(col("toks"), i + 1),
                element_at(col("toks"), i + 2),
                element_at(col("toks"), i + 3))).as("gs"))
        val sampled = gramArrays.select(col("doc_id"),
            substring(md5(col("doc_id").cast("string")), 1, 4).as("sk"),
            explode(array_distinct(col("gs"))).as("g"))
          .filter(substring(md5(col("g")), 1, 1) === "0")
        val evalG = sampled.filter(col("sk") < "1000")
          .select(col("g")).distinct()
        val bloomDf = evalG.agg(graft.functions.BloomSketch
          .sketch(xxhash64(col("g"))).as("bloom"))
        val trainG = sampled.filter(col("sk") >= "1000")
          .select(col("doc_id"), col("g"))
        val flags = trainG
          .crossJoin(broadcast(bloomDf))
          .join(broadcast(evalG.withColumnRenamed("g", "eg")),
            col("g") === col("eg"), "left")
          .groupBy("doc_id")
          .agg(
            max(graft.functions.BloomSketch
              .mightContain(col("bloom"), xxhash64(col("g")))).as("bloom_f"),
            max(col("eg").isNotNull).as("exact_f"))
        flags.agg(
            count(lit(1)).as("n_train"),
            sum(when(col("exact_f"), 1L).otherwise(0L)).as("n_contaminated_exact"),
            sum(when(col("exact_f") && !col("bloom_f"), 1L).otherwise(0L)).as("esc"),
            sum(when(col("bloom_f") && !col("exact_f"), 1L).otherwise(0L)).as("fp"))
          .select(
            col("n_train"), col("n_contaminated_exact"),
            (col("esc") === 0L).as("bloom_superset"),
            (col("fp") * 100L <= col("n_train")).as("bloom_fp_ok"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |  WHERE len(string_split(text, ' ')) >= 3),
             |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
             |grams AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM idx),
             |samp AS (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sk, g
             |  FROM grams WHERE substring(md5(g), 1, 1) = '0'),
             |ev AS (SELECT DISTINCT g FROM samp WHERE sk < '1000'),
             |tr AS (SELECT DISTINCT doc_id FROM samp WHERE sk >= '1000'),
             |hit AS (SELECT DISTINCT s.doc_id FROM samp s JOIN ev ON s.g = ev.g
             |  WHERE s.sk >= '1000')
             |SELECT CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_train,
             |  CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_contaminated_exact,
             |  TRUE AS bloom_superset, TRUE AS bloom_fp_ok""".stripMargin)),

    QueryDef(
      "q_mix_epochs",
      // Epoch-weighted corpus mixing: each source gets a repetition factor
      // (src0-4: 2.5 epochs, src5-9: 1, rest: 0.25) and every document
      // emits one row PER epoch copy — the up/down-sampling primitive
      // behind pretraining data mixes ("see wiki 3×, crawl 0.25×").
      // Fractional epochs are a deterministic md5-prefix lottery (the
      // q_sample_hash primitive), so the materialized mix is stable across
      // engines, partitionings and reruns — re-running the pipeline
      // reproduces the same corpus byte-for-byte. Pure map-side
      // explode(sequence(0, n-1)); no shuffle except the final sort.
      (s, dir) => {
        val sid = substring(col("source"), 4, 10).cast("int")
        val whole = when(sid < 5, 2).when(sid < 10, 1).otherwise(0)
        val fracT = when(sid < 5, "8000").when(sid < 10, "0000").otherwise("4000")
        val hk = substring(md5(col("doc_id").cast("string")), 1, 4)
        val n = whole + when(hk < fracT, 1).otherwise(0)
        // guard n=0: Spark's sequence(0, -1) DESCENDS ([0,-1]) instead of
        // being empty like generate_series — dropped docs must emit nothing
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            explode(when(n >= 1, sequence(lit(0), n - 1))
              .otherwise(array().cast("array<int>"))).as("epoch"))
          .select(col("doc_id"), col("source"), col("epoch").cast("long").as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, source,
             |    (CASE WHEN CAST(substring(source, 4) AS INT) < 5 THEN 2
             |          WHEN CAST(substring(source, 4) AS INT) < 10 THEN 1
             |          ELSE 0 END)
             |    + (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
             |          (CASE WHEN CAST(substring(source, 4) AS INT) < 5 THEN '8000'
             |                WHEN CAST(substring(source, 4) AS INT) < 10 THEN '0000'
             |                ELSE '4000' END)
             |        THEN 1 ELSE 0 END) AS n
             |  FROM documents)
             |SELECT doc_id, source, CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS epoch
             |FROM base ORDER BY doc_id, epoch""".stripMargin)),

    QueryDef(
      "q_dedup_keep_best",
      // Quality-ranked canonical selection (dedup's second half): docs
      // group by a whitespace-normalized content fingerprint and the BEST
      // copy survives — longest first (n_chars desc), smallest doc_id as
      // the tiebreak — unlike q_dedup_exact's min-id-per-exact-text. One
      // shuffle on the fingerprint; WindowGroupLimit caps per-group rows
      // ahead of the exchange, so a pathological million-copy group costs
      // its map tasks one row each, not a reducer melt.
      (s, dir) => {
        val fp = md5(regexp_replace(trim(col("text")), "\\s+", " "))
        val w = Window.partitionBy("fp").orderBy(desc("n_chars"), asc("doc_id"))
        val wAll = Window.partitionBy("fp")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "documents")
          .withColumn("fp", fp)
          .withColumn("group_size", count(lit(1)).over(wAll))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("n_chars"), col("source"),
            col("group_size"), col("fp"))
          .orderBy("doc_id")
      },
      Some("""WITH ranked AS (SELECT doc_id, n_chars, source,
             |  MD5(regexp_replace(TRIM(text), '\s+', ' ', 'g')) AS fp,
             |  COUNT(*) OVER (PARTITION BY MD5(regexp_replace(TRIM(text), '\s+', ' ', 'g'))) AS group_size,
             |  ROW_NUMBER() OVER (PARTITION BY MD5(regexp_replace(TRIM(text), '\s+', ' ', 'g'))
             |    ORDER BY n_chars DESC, doc_id) AS rn
             |FROM documents)
             |SELECT doc_id, n_chars, source, CAST(group_size AS BIGINT) AS group_size, fp
             |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_text_diversity",
      // Lexical-diversity scores per doc — type-token ratio and the
      // Gini–Simpson index 1 − Σcᵢ²/N² — chosen over entropy precisely
      // because both are EXACT-integer-derived (counts, Σc²) with one
      // final IEEE division, so the DuckDB hash-compare holds bit-for-bit
      // where a log2-based score would ride on libm. Two keyed aggs
      // ((doc, token) then doc), both map-side combined; the repetition /
      // boilerplate filter signal for corpus curation.
      (s, dir) => {
        val tc = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        tc.groupBy("doc_id")
          .agg(sum("c").as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            sum(col("c") * col("c")).as("sum_c2"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            toDbl((col("n_distinct").cast("double") / col("n_tokens").cast("double"))
              .cast(Dec38)).as("ttr"),
            toDbl((lit(1.0) - col("sum_c2").cast("double") /
              (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
              .cast(Dec38)).as("simpson"))
          .orderBy("doc_id")
      },
      Some("""WITH tc AS (SELECT doc_id, tok, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
             |  GROUP BY doc_id, tok),
             |agg AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
             |  SUM(c*c) AS sum_c2 FROM tc GROUP BY doc_id)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(n_distinct AS BIGINT) AS n_distinct,
             |  CAST(CAST(CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE) AS ttr,
             |  CAST(CAST(1.0 - CAST(sum_c2 AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,6)) AS DOUBLE) AS simpson
             |FROM agg ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_lm_score",
      // Unigram language-model scoring — the KenLM-style quality-filter
      // proxy: avg per-token log-probability under the corpus's own
      // unigram model, avg_lp = (Σ_occ ln c_tok)/n − ln T. The corpus pass
      // is one (tok) count agg; scoring joins tokens to counts on the tok
      // key — left to the cost-based planner, never FORCE-broadcast (an
      // open-vocabulary 100 TB crawl's count table can exceed executor
      // memory; a small vocabulary may still auto-broadcast) — and
      // reduces per doc. Determinism: Σ ln would be an order-dependent
      // double sum, so each ln is rounded to DECIMAL(38,6) FIRST and the
      // sum runs exact/order-independent in decimal; the closing formula
      // is the same IEEE expression on both engines. At scale, pre-collapse
      // (doc, tok) pairs and weight by the pair count to shrink the join.
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val tc = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        // corpus total from the vocabulary frame — NOT a third
        // tokenize+explode pass over the documents (review r8 finding)
        val tot = tc.agg(sum(col("c")).as("t"))
        toks.join(tc, "tok")
          .groupBy("doc_id")
          .agg(sum(dec(log(col("c").cast("double")))).as("slc"),
            count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("n").as("n_tokens"),
            toDbl(((col("slc").cast("double")
              - col("n").cast("double") * log(col("t").cast("double")))
              / col("n").cast("double")).cast(Dec38)).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |              FROM documents),
             |tc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
             |tot AS (SELECT COUNT(*) AS t FROM toks)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |  CAST(CAST((CAST(SUM(CAST(LN(CAST(c AS DOUBLE)) AS DECIMAL(38,6))) AS DOUBLE)
             |    - CAST(COUNT(*) AS DOUBLE) * LN(CAST(t AS DOUBLE)))
             |    / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE) AS avg_logprob
             |FROM toks JOIN tc USING (tok), tot
             |GROUP BY doc_id, t ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_corpus_refresh",
      // The INTEGRATED ingest pipeline as one declared query — what a
      // production corpus refresh actually runs, end to end THROUGH THE
      // LAKEHOUSE WRITE PATH: the existing corpus (doc_id < 400) is
      // committed to a Delta table; the bounded incoming batch (doc_id ∈ [400, 500)) is
      // exact-deduped (md5 anti-join vs the existing fingerprint set),
      // near-deduped (incoming×existing gram Jaccard ≥ 0.05 anti-join —
      // the q_dedup_incremental machinery as a FILTER), quality-filtered
      // (≥ 20 tokens), and APPENDED as a second Delta version; the
      // refreshed table is read back through the Delta log reader and
      // summarized per language. The oracle recomputes the final state
      // relationally, so dedup semantics, the filter, the append commit
      // and the log read all sit under one hash check.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val incoming = docs.filter(col("doc_id") >= 400 && col("doc_id") < 500)
        val existing = docs.filter(col("doc_id") < 400)
        // gram array materialized ONCE per row in its own projection, then
        // exploded and sized off the attribute — never the O(tokens)
        // expression twice per row (same shape as q_dedup_incremental)
        def grams(df: org.apache.spark.sql.DataFrame, idAs: String) = df
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            array_distinct(transform(sequence(lit(0), size(col("toks")) - 3),
              i => concat_ws(" ",
                element_at(col("toks"), i + 1),
                element_at(col("toks"), i + 2),
                element_at(col("toks"), i + 3)))).as("gs"))
          // explode_outer: see SURVEY note 2 (inferred size(gs)>0 filter
          // re-inlines the gram lambda per scanned row otherwise)
          .select(col("doc_id").as(idAs), explode_outer(col("gs")).as("g"),
            size(col("gs")).cast("long").as("n"))
        val gi = grams(incoming, "inc_id")
        val ge = grams(existing, "ex_id")
        val nearIds = gi.join(ge.withColumnRenamed("n", "ne"), "g")
          .groupBy("inc_id", "ex_id", "n", "ne").agg(count(lit(1)).as("ix"))
          .filter((col("ix").cast("double")
            / (col("n") + col("ne") - col("ix")).cast("double")).cast(Dec38) >= 0.05)
          .select(col("inc_id").as("doc_id")).distinct()
        val exFp = existing.select(md5(col("text")).as("fp")).distinct()
        val kept = incoming
          .filter(size(split(col("text"), " ")) >= 20)
          .join(exFp, md5(col("text")) === col("fp"), "left_anti")
          .join(nearIds, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang", "n_chars", "text", "source")
        val table = graft.TempTables.create("graft-refresh")
        graft.sinks.DeltaSink.write(
          existing.select("doc_id", "lang", "n_chars", "text", "source"),
          table, overwrite = true)
        graft.sinks.DeltaSink.append(kept, table)
        graft.sinks.DeltaSink.read(s, table)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("sum_chars"))
          .orderBy("lang")
      },
      Some("""WITH incoming AS (SELECT * FROM documents WHERE doc_id >= 400 AND doc_id < 500),
             |existing AS (SELECT * FROM documents WHERE doc_id < 400),
             |gi AS (
             |  SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
             |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM incoming)
             |  WHERE len(t) >= 3),
             |ge AS (
             |  SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
             |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM existing)
             |  WHERE len(t) >= 3),
             |grams_i AS (SELECT DISTINCT doc_id AS inc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM gi),
             |grams_e AS (SELECT DISTINCT doc_id AS ex_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM ge),
             |sz_i AS (SELECT inc_id, COUNT(*) AS n FROM grams_i GROUP BY 1),
             |sz_e AS (SELECT ex_id, COUNT(*) AS ne FROM grams_e GROUP BY 1),
             |near AS (
             |  SELECT DISTINCT inc_id AS doc_id
             |  FROM (SELECT inc_id, ex_id, COUNT(*) AS ix
             |        FROM grams_i JOIN grams_e USING (g) GROUP BY 1, 2) x
             |  JOIN sz_i USING (inc_id) JOIN sz_e USING (ex_id)
             |  WHERE CAST(CAST(ix AS DOUBLE) / CAST(n + ne - ix AS DOUBLE) AS DECIMAL(38,6)) >= 0.05),
             |kept AS (
             |  SELECT i.* FROM incoming i
             |  WHERE len(string_split(i.text, ' ')) >= 20
             |    AND md5(i.text) NOT IN (SELECT md5(text) FROM existing)
             |    AND i.doc_id NOT IN (SELECT doc_id FROM near)),
             |refreshed AS (SELECT * FROM existing UNION ALL SELECT * FROM kept)
             |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM refreshed GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      "q_mix_temperature",
      // Temperature-flattened source resampling — the multilingual-corpus
      // mixing rule (sample source s with p ∝ n_s^α, α=0.5): head sources
      // downsample, tail sources upsample (with repetition), total stays
      // ≈ corpus size. Deterministic throughout: per-source targets are
      // floor(T·n^α / Σn^α) with the Σ computed in DECIMAL (order-free)
      // and the pow/floor mirrored token-for-token; selection is the
      // md5-prefix lottery ordered (epoch, md5, doc_id), so full epochs
      // precede repeats and the kept set is engine/partitioning/
      // rerun-stable. One broadcast of the ~|sources| target table, one
      // per-source window sort — at 100 TB the same targets drive the
      // hash-threshold (sort-free) variant, trading exact counts for
      // shuffle-free selection.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val stats = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
        val tot = stats.agg(
          sum(col("n")).cast("double").as("t"),
          toDbl(sum(pow(col("n").cast("double"), 0.5).cast(dec12)).cast(dec12))
            .as("wsum"))
        val tgt = stats.crossJoin(broadcast(tot))
          .select(col("lang"), col("n"),
            floor(col("t") * pow(col("n").cast("double"), 0.5) / col("wsum"))
              .cast("long").as("tgt"))
        val expanded = docs.select("doc_id", "lang")
          .join(broadcast(tgt), "lang")
          .withColumn("reps",
            greatest(ceil(col("tgt").cast("double") / col("n").cast("double"))
              .cast("int"), lit(1)))
          .withColumn("epoch", explode(sequence(lit(0), col("reps") - 1)))
        val w = Window.partitionBy("lang")
          .orderBy(col("epoch"), md5(col("doc_id").cast("string")), col("doc_id"))
        expanded.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= col("tgt"))
          .select(col("doc_id"), col("lang"),
            col("epoch").cast("long").as("epoch"), col("rn"))
          .orderBy("lang", "rn")
      },
      Some("""WITH stats AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
             |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t,
             |  CAST(CAST(SUM(CAST(pow(CAST(n AS DOUBLE), 0.5) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE) AS wsum
             |  FROM stats),
             |tgt AS (SELECT lang, n,
             |  CAST(FLOOR(t * pow(CAST(n AS DOUBLE), 0.5) / wsum) AS BIGINT) AS tgt
             |  FROM stats, tot),
             |expanded AS (
             |  SELECT d.doc_id, d.lang, u.e AS epoch, tgt.tgt
             |  FROM documents d JOIN tgt ON d.lang = tgt.lang,
             |  UNNEST(range(GREATEST(CAST(CEIL(CAST(tgt.tgt AS DOUBLE) / tgt.n) AS BIGINT), 1))) AS u(e)),
             |ranked AS (
             |  SELECT doc_id, lang, epoch, tgt,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY epoch, md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM expanded)
             |SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch, CAST(rn AS BIGINT) AS rn
             |FROM ranked WHERE rn <= tgt ORDER BY lang, rn""".stripMargin)),

    QueryDef(
      "q_dedup_lines",
      // Sub-document (line/paragraph-level) exact dedup — the
      // RefinedWeb/Gopher corpus cleanup that removes boilerplate spans
      // repeated verbatim across many documents while keeping the rest of
      // each document intact. "Lines" here are fixed 10-word chunks (the
      // corpus carries no newlines); a chunk appearing >2 times
      // corpus-wide is dropped, and each document is reassembled from its
      // surviving chunks in order.
      //
      // Scale (100 TB): chunking is MAP-SIDE (sequence+slice inside the
      // row — no token explode); the plan shuffles (a) chunk rows once to
      // count frequencies (map-side partial combine on the hash-grouped
      // chunk text) and (b) once more on doc_id to reassemble. The
      // frequency join streams chunk rows against the counted side with
      // AQE free to broadcast it when the distinct-chunk set is small;
      // reassembly order is explicit (array_sort on chunk_idx), never
      // partition-order-dependent.
      (s, dir) => {
        val chunks = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), posexplode(expr(
            """transform(sequence(0, cast(ceil(size(w)/10.0) as int) - 1),
              |          i -> array_join(slice(w, i*10+1, 10), ' '))""".stripMargin)))
          .withColumnRenamed("pos", "chunk_idx")
          .withColumnRenamed("col", "chunk_text")
        val counted = chunks.groupBy("chunk_text").agg(count(lit(1)).as("cnt"))
        chunks.join(counted, "chunk_text")
          .groupBy("doc_id")
          .agg(
            array_join(expr(
              "transform(array_sort(collect_list(CASE WHEN cnt <= 2 THEN " +
                "struct(chunk_idx, chunk_text) END)), x -> x.chunk_text)"),
              " ").as("cleaned_text"),
            count(when(col("cnt") <= 2, 1)).as("n_kept"),
            count(when(col("cnt") > 2, 1)).as("n_dropped"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |chunks AS (
             |  SELECT doc_id, i AS chunk_idx,
             |         array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk_text
             |  FROM toks, UNNEST(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS u(i)),
             |counted AS (SELECT chunk_text, COUNT(*) AS cnt FROM chunks GROUP BY 1)
             |SELECT doc_id,
             |  COALESCE(string_agg(CASE WHEN cnt <= 2 THEN chunk_text END, ' '
             |                      ORDER BY chunk_idx), '') AS cleaned_text,
             |  CAST(COUNT(*) FILTER (WHERE cnt <= 2) AS BIGINT) AS n_kept,
             |  CAST(COUNT(*) FILTER (WHERE cnt > 2) AS BIGINT) AS n_dropped
             |FROM chunks JOIN counted USING (chunk_text)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "q_train_split",
      // Deterministic train/val/test assignment (r9) — the split every
      // training pipeline makes FIRST, done the only way that survives
      // reruns, engine swaps and repartitioning: an md5-prefix lottery on
      // the doc key (the q_sample_hash idiom, salted so this split is
      // independent of every other lottery in the suite) cut at
      // 0xe666/0xf333 ≈ 90/5/5. Reports per-(source, split) doc counts
      // and within-source shares — the audit view that catches a skewed
      // split before training does. Map-side assignment + one tiny
      // grouped aggregate; the per-source totals broadcast back.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bucket = substring(
          md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 4)
        val assigned = docs.select(col("source"),
          when(bucket < "e666", "train")
            .when(bucket < "f333", "val")
            .otherwise("test").as("split"))
        val totals = docs.groupBy("source").agg(count(lit(1)).as("total"))
        assigned.groupBy("source", "split").agg(count(lit(1)).as("docs"))
          .join(broadcast(totals), Seq("source"))
          .select(col("source"), col("split"), col("docs"),
            (col("docs").cast("double") / col("total").cast("double")).as("share"))
          .orderBy("source", "split")
      },
      Some("""WITH assigned AS (
             |  SELECT source,
             |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) < 'e666' THEN 'train'
             |         WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) < 'f333' THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM documents),
             |totals AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS total
             |           FROM documents GROUP BY 1)
             |SELECT a.source, a.split, CAST(COUNT(*) AS BIGINT) AS docs,
             |  CAST(COUNT(*) AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
             |FROM assigned a JOIN totals t ON a.source = t.source
             |GROUP BY a.source, a.split, t.total
             |ORDER BY a.source, a.split""".stripMargin)),

    QueryDef(
      "q_dedup_substring",
      // Substring-level duplication audit (r10) — the Lee-et-al-style
      // "repeated spans across documents" signal that doc-level dedup
      // (q_dedup_exact/minhash) cannot see: boilerplate headers, quoted
      // passages, licence blocks. Window positions are CONTENT-DEFINED
      // (winnowing-style): position i is sampled iff the first md5 nibble
      // of its 8-char seed is '0' (expected density 1/16), so two docs
      // sharing a run select the IDENTICAL in-run positions regardless of
      // where the run sits in each doc — a fixed stride would only catch
      // runs aligned mod stride. A sampled 40-char window whose hash
      // appears in >= 2 DISTINCT docs marks a cross-document duplicated
      // span; reports per-doc sampled/dup counts + dup ratio — the
      // pre-training filter keys on dup_ratio.
      //
      // Scale shape (r14 restructure after the r13 scaling audit flagged
      // this as the steepest real curve): candidate positions explode
      // map-side but the 15/16 rejected ones die in the same codegen
      // stage — only the sampled slim (doc_id, md5) rows ever shuffle
      // (~chars/16), and the corpus is exploded exactly ONCE: the first
      // aggregate collapses to per-(doc, h) counts (map-side combine),
      // and everything downstream — the >= 2-docs census (count of rows
      // per h over that pre-aggregate, distinct-by-construction), the dup
      // marking (one equi join on h), both per-doc totals (one final
      // groupBy) — runs over the collapsed intermediate, which is bounded
      // by sampled-distinct windows, not corpus characters. The previous
      // shape recomputed the explode+md5 THREE times (census, semi-join
      // probe, totals); at 100 TB that is two full corpus re-scans for
      // nothing. A degenerate hot hash (a whitespace window shared by
      // millions of docs) is one census group and one join row per doc
      // that has it — hot spans cost no replication. At 100 TB, swap md5
      // for xxhash64 to shrink the shuffled key 4x (kept md5 here because
      // DuckDB mirrors it token-for-token) and pre-chunk multi-MB docs so
      // the per-row position array stays bounded.
      (s, dir) => {
        val W = 40
        val wins = t(s, dir, "documents")
          .filter(col("text").isNotNull && length(col("text")) >= W)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1),
              length(col("text")) - (W - 1), lit(1))).as("i"))
          .filter(substring(md5(col("text").substr(col("i"), lit(8))), 1, 1)
            === "0")
          .select(col("doc_id"),
            md5(col("text").substr(col("i"), lit(W))).as("h"))
          // h = md5(non-null) is never null, so this filters nothing — but
          // declaring it makes BOTH branches below carry the isnotnull(h)
          // constraint the left join would otherwise infer only on the dup
          // side, which silently broke their exchange-subtree equality
          // (r19; see the ReusedExchange note below)
          .filter(col("h").isNotNull)
        // ONE pass over the corpus: windows collapse to (doc, h, count)
        val perDocH = wins.groupBy("doc_id", "h")
          .agg(count(lit(1)).as("c"))
        // census over the collapse: rows are distinct (doc, h) pairs, so
        // docs-per-hash is a plain count — no distinct expansion needed.
        // count(when(c >= 1, 1)), NOT count(1) (r19, guide §2.4): c = a
        // group count is always >= 1, so the value is identical — but with
        // count(1) the column pruner stripped `c` from this branch's
        // partial aggregate, making its exchange subtree canonically
        // DIFFERENT from perDocH's, so ReusedExchange never fired and the
        // corpus explode+md5 ran TWICE (two Scan+Generate chains in the
        // r18 plan). Catalyst cannot prove c >= 1 (and cannot fold
        // count(c) of a non-nullable c the way it rewrote a plain count),
        // so `c` survives pruning, both branches share one exchange, and
        // the census reads the shuffle files instead of re-exploding the
        // corpus.
        val dup = perDocH.groupBy("h")
          .agg(count(when(col("c") >= 1, lit(1))).as("nd"))
          .filter(col("nd") >= 2).select(col("h"), lit(1).as("is_dup"))
        perDocH.join(dup, Seq("h"), "left")
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_windows"),
            sum(when(col("is_dup").isNotNull, col("c")).otherwise(0L))
              .as("n_dup"))
          .select(col("doc_id"), col("n_windows"), col("n_dup"),
            (col("n_dup").cast("double") / col("n_windows").cast("double"))
              .as("dup_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, md5(substr(text, CAST(i AS INT), 40)) AS h
             |  FROM (SELECT doc_id, text,
             |          UNNEST(range(1, length(text)-39+1, 1)) AS i
             |        FROM documents WHERE text IS NOT NULL AND length(text) >= 40)
             |  WHERE substr(md5(substr(text, CAST(i AS INT), 8)), 1, 1) = '0'),
             |dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
             |per_doc AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
             |    CAST(COUNT(*) FILTER (WHERE h IN (SELECT h FROM dup)) AS BIGINT) AS n_dup
             |  FROM w GROUP BY doc_id)
             |SELECT doc_id, n_windows, n_dup,
             |  CAST(n_dup AS DOUBLE) / CAST(n_windows AS DOUBLE) AS dup_ratio
             |FROM per_doc ORDER BY doc_id""".stripMargin)),
  )
}
