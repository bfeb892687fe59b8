package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-3 curation & representation operators [EXT]: corpus-wide
  * segment-level dedup (RefinedWeb-style repeated-span removal,
  * Penedo et al. 2023 §3.3), benchmark-contamination severity levels
  * (the graded form of q71's binary gate), rational-idf keyword
  * extraction, binary-column (multimodal blob) plumbing with a cross-engine
  * oracle, token-budget mixture packing, and sign-bit embedding
  * sketches with banded near-dup pairing (1-bit quantization, the
  * memory-lean sibling of the q33/q55 cosine paths).
  *
  * Scale notes on each query; common theme as TrainingOps: candidates
  * come from bounded-fan-out equi-joins, small sides are broadcast,
  * per-row work is map-only.
  */
object CurationOps {
  import Tables._

  private val toksCte = Dedup.toksCteSql

  /** The 63-sign-bit sketch — the single source of truth shared by q85
    * (published fingerprints) and q86 (pairing built ON those
    * fingerprints), so an edit to the packing can't silently diverge
    * them. Spark expression and oracle CTE are the same construction:
    * bit j set iff embedding[j] > 0, bit 63 unused (keeps the packed
    * value in signed-64 range in both engines). */
  private val sketchExpr: String =
    """aggregate(sequence(0, 62), 0L, (acc, j) ->
         acc + CASE WHEN element_at(embedding, j + 1) > 0.0
                    THEN shiftleft(1L, j) ELSE 0L END)"""

  private val sketchCteSql: String =
    """sk AS (SELECT vec_id,
         CAST(list_sum(list_transform(range(0, 63), j ->
           CASE WHEN embedding[j + 1] > 0 THEN (CAST(1 AS BIGINT) << j)
                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sketch
       FROM embeddings)"""

  def queries: Vector[Q] = Vector(
    // ---- corpus-wide segment dedup -----------------------------------
    // Repeated-span removal: docs are cut into consecutive 8-token
    // segments and a segment that already occurred anywhere else in
    // the corpus (first occurrence = smallest (doc_id, pos)) is
    // dropped; surviving segments are reassembled in order. This is
    // the segment-granular middle ground between exact doc dedup (q25)
    // and near-dup doc removal (q79): boilerplate shared across
    // otherwise-distinct docs is removed exactly once.
    // Scale: one explode (corpus token stream / 8 rows), one window on
    // the segment hash — skew on a mega-frequent segment is bounded
    // because the window only ranks rows WITHIN one segment's
    // partition (no cross-key fan-out), and the reassembly groupBy is
    // keyed by doc_id (uniform). No all-pairs anything.
    Q("q80_segment_dedup",
      (s, dir) => {
        import s.implicits._
        val seg = 8
        val docs = Dedup.withToks(documents(s, dir))
        val chunks = docs.select($"doc_id",
            posexplode(expr(
              s"""transform(sequence(0, CAST((size(toks) + ${seg - 1}) div $seg AS INT) - 1),
                            i -> concat_ws(' ', slice(toks, i * $seg + 1, $seg)))""")))
          .toDF("doc_id", "pos", "chunk")
        val w = Window.partitionBy($"chunk").orderBy($"doc_id", $"pos")
        chunks.withColumn("rn", row_number().over(w))
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("total_segs"),
            sum(when($"rn" === 1, 1L).otherwise(0L)).as("kept_segs"),
            array_join(
              transform(
                array_sort(collect_list(when($"rn" === 1, struct($"pos", $"chunk")))),
                x => x.getField("chunk")),
              " ").as("text_clean"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH $toksCte,
        chunks AS (SELECT doc_id, i AS pos,
            array_to_string(list_slice(w, i * 8 + 1, i * 8 + 8), ' ') AS chunk
          FROM toksc, UNNEST(range(0, (len(w) + 7) // 8)) AS t(i)),
        rn AS (SELECT doc_id, pos, chunk,
            ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
          FROM chunks)
        SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS total_segs,
          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
          COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '') AS text_clean
        FROM rn GROUP BY doc_id ORDER BY doc_id""")),

    // ---- contamination severity levels -------------------------------
    // The graded form of q71: per corpus doc, the fraction of its
    // DISTINCT 5-grams that appear in the benchmark slice (source =
    // 'src0'), bucketed clean / low / high. Drop-vs-keep policies at
    // scale key off the severity, not the binary flag, so EVERY corpus
    // doc gets a row: docs too short to carry a 5-gram (< 5 tokens)
    // can't overlap anything and are 'clean' with zero grams — a
    // severity join against the corpus must never come back empty.
    // Same broadcast shape as q71: the benchmark gram set is small by
    // construction, the corpus side never shuffles for the membership
    // test.
    Q("q81_contamination_levels",
      (s, dir) => {
        import s.implicits._
        val docs = documents(s, dir)
        val g5 = Dedup.withToks(docs)
          .select($"doc_id", $"source", explode(expr(Dedup.gramArraySql(5))).as("g"))
          .distinct()
        val bench = g5.filter($"source" === "src0").select($"g").distinct()
          .withColumn("hit", lit(1))
        val agg = g5.filter($"source" =!= "src0")
          .join(broadcast(bench), Seq("g"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("gram_count"),
            sum(coalesce($"hit", lit(0))).cast(LongType).as("hit_count"))
        docs.filter($"source" =!= "src0").select($"doc_id")
          .join(agg, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"gram_count", lit(0L)).as("n_grams"),
            coalesce($"hit_count", lit(0L)).as("n_hits"))
          .select($"doc_id", $"n_grams", $"n_hits",
            when($"n_grams" === 0, lit(0.0))
              .otherwise(round($"n_hits".cast(DoubleType) / $"n_grams", 6)).as("share"),
            when($"n_hits" === 0, lit("clean"))
              .when(round($"n_hits".cast(DoubleType) / $"n_grams", 6) < 0.1, lit("low"))
              .otherwise(lit("high")).as("level"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH $toksCte,
        g5 AS (SELECT DISTINCT doc_id, source,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS g
               FROM toksc, UNNEST(range(1, len(w) - 3)) AS t(i)),
        bench AS (SELECT DISTINCT g FROM g5 WHERE source = 'src0'),
        agg AS (SELECT c.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS gram_count,
                  CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hit_count
                FROM (SELECT doc_id, g FROM g5 WHERE source <> 'src0') c
                LEFT JOIN bench b ON c.g = b.g
                GROUP BY c.doc_id),
        full_docs AS (SELECT d.doc_id,
                  COALESCE(a.gram_count, 0) AS n_grams,
                  COALESCE(a.hit_count, 0) AS n_hits
                FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
                WHERE d.source <> 'src0')
        SELECT doc_id, n_grams, n_hits,
          CASE WHEN n_grams = 0 THEN 0.0
               ELSE ROUND(CAST(n_hits AS DOUBLE) / n_grams, 6) END AS share,
          CASE WHEN n_hits = 0 THEN 'clean'
               WHEN ROUND(CAST(n_hits AS DOUBLE) / n_grams, 6) < 0.1 THEN 'low'
               ELSE 'high' END AS level
        FROM full_docs ORDER BY doc_id""")),

    // ---- keyword extraction (rational-idf salience) ------------------
    // Top-3 terms per doc by tf * (N / df) — a log-free idf variant.
    // NOT literal TF-IDF: log only preserves ordering between terms of
    // EQUAL tf, so when tf varies the rational score over-weights rare
    // terms relative to tf * log(N/df) (e.g. tf=1,N/df=16 outranks
    // tf=3,N/df=4 here but not under log-idf). That bias is the price
    // of bit-reproducibility — libm's log drifts across engines and a
    // last-ulp flip near a rounding boundary would fail the oracle's
    // hash compare; the score is a keyword-salience heuristic, not a
    // drop-in TF-IDF. Scale: tf is one doc-keyed aggregate; df is
    // vocabulary-sized (small) and BROADCAST back; the top-k window
    // partitions by doc_id (uniform, and row_number <= k plans as
    // WindowGroupLimit in Spark 4).
    Q("q82_keyword_scores",
      (s, dir) => {
        import s.implicits._
        val docs = documents(s, dir)
        val dtok = Dedup.withToks(docs)
          .select($"doc_id", explode($"toks").as("tok"))
          .filter(length($"tok") > 0)
        val tf = dtok.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy($"tok").agg(count(lit(1)).as("dfc"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(broadcast(dfc), "tok").crossJoin(broadcast(n))
          .withColumn("score", round($"tf".cast(DoubleType) * $"n_docs" / $"dfc", 6))
        val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"tok")
        scored.withColumn("kw_rank", row_number().over(w))
          .filter($"kw_rank" <= 3)
          .select($"doc_id", $"kw_rank", $"tok", $"score")
          .orderBy($"doc_id", $"kw_rank")
      },
      Some(s"""
        WITH $toksCte,
        dtok AS (SELECT doc_id, tok
                 FROM (SELECT doc_id, UNNEST(w) AS tok FROM toksc) u WHERE len(tok) > 0),
        tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM dtok GROUP BY 1, 2),
        df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dfc FROM tf GROUP BY tok),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (SELECT doc_id, tok,
                     ROUND(CAST(tf AS DOUBLE) * n_docs / dfc, 6) AS score
                   FROM tf JOIN df USING (tok) CROSS JOIN n),
        rk AS (SELECT doc_id, tok, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS kw_rank
               FROM scored)
        SELECT doc_id, CAST(kw_rank AS INT) AS kw_rank, tok, score
        FROM rk WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""")),

    // ---- binary-column (blob) plumbing -------------------------------
    // Multimodal lake layout treats payloads as opaque BinaryType with
    // typed metadata (Multimodal.scala); this is the ORACLE-CHECKED
    // slice of that plumbing: build a blob (unhex of md5 — a stand-in
    // for real bytes), take a per-row-sized prefix "thumbnail" with
    // substring-on-binary (the built-in the codec stub uses — no UDF),
    // and publish hex. The oracle never materializes a blob: hex of a
    // binary prefix == hex-string prefix of twice the length, so
    // DuckDB checks the byte math symbolically. Map-only at any scale.
    Q("q83_blob_thumbnails",
      (s, dir) => {
        import s.implicits._
        documents(s, dir)
          .withColumn("blob", unhex(md5($"text")))
          .withColumn("thumb_bytes", (lit(1) + $"doc_id" % 8).cast(IntegerType))
          .select($"doc_id", $"thumb_bytes",
            lower(hex(expr("substring(blob, 1, thumb_bytes)"))).as("thumb_hex"),
            length($"blob").as("blob_bytes"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
          CAST(1 + doc_id % 8 AS INT) AS thumb_bytes,
          substring(md5(text), 1, 2 * CAST(1 + doc_id % 8 AS INT)) AS thumb_hex,
          CAST(16 AS INT) AS blob_bytes
        FROM documents ORDER BY doc_id""")),

    // ---- token-budget mixture packing --------------------------------
    // Fill a per-source token budget in a deterministic pseudo-random
    // order (md5 of doc_id — the same hash-as-rank trick as q24/q73):
    // a doc is taken iff the budget is not yet exhausted when its turn
    // starts. The running total is one window cumsum per source; at
    // 100 TB this is the standard "sample each mixture component to
    // its token share" step, and the window never sees more than one
    // source's stream per partition.
    Q("q84_token_budget_pack",
      (s, dir) => {
        import s.implicits._
        val budget = 3000L
        val d = Dedup.withToks(documents(s, dir))
          .select($"doc_id", $"source",
            size(array_remove($"toks", "")).cast(LongType).as("ntok"),
            md5($"doc_id".cast(StringType)).as("ord"))
        val w = Window.partitionBy($"source").orderBy($"ord")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.withColumn("cum", sum($"ntok").over(w))
          .filter($"cum" - $"ntok" < budget)
          .select($"doc_id", $"source", $"ntok", $"cum")
          .orderBy($"source", $"cum", $"doc_id")
      },
      Some(s"""
        WITH $toksCte,
        d AS (SELECT doc_id, source,
            CAST(len(list_filter(w, t -> len(t) > 0)) AS BIGINT) AS ntok,
            md5(CAST(doc_id AS VARCHAR)) AS ord
          FROM toksc),
        c AS (SELECT doc_id, source, ntok,
            CAST(SUM(ntok) OVER (PARTITION BY source ORDER BY ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM d)
        SELECT doc_id, source, ntok, cum FROM c
        WHERE cum - ntok < 3000 ORDER BY source, cum, doc_id""")),

    // ---- sign-bit embedding sketch (1-bit quantization) --------------
    // 63 sign bits of the embedding packed into one BIGINT — the
    // axis-aligned special case of hyperplane LSH (q55) and the
    // cheapest usable vector fingerprint: 8 bytes per vector, computed
    // row-local (map-only). Bit 63 is left unused so the packed value
    // stays in signed-64 range in BOTH engines without the HUGEINT
    // mod-2^64 contortions (sign comparisons are exact — no float
    // drift — so the sketch is bit-reproducible cross-engine).
    Q("q85_sign_sketch",
      (s, dir) => {
        import s.implicits._
        embeddings(s, dir)
          .select($"vec_id", expr(sketchExpr).as("sketch"))
          .orderBy($"vec_id")
      },
      Some(s"""
        WITH $sketchCteSql
        SELECT vec_id, sketch FROM sk ORDER BY vec_id""")),

    // ---- sign-sketch near-dup pairs (banded LSH) ---------------------
    // Embedding near-dup via the q85 sketch: 8 bands of 8 bits, a pair
    // is a candidate iff it collides in SOME band (equi-join on
    // (band, value) — never all pairs), then the exact Hamming check
    // keeps distance <= 16. Recall is PROBABILISTIC, exactly like
    // q27's minhash banding: a qualifying pair is found iff some band
    // is flip-free (h=14 -> ~68% per pair) — the standard LSH trade;
    // radius-exact banding (bands > radius) is impossible here because
    // sign flips on even strongly-cosine-similar vectors concentrate
    // near h~14 of 63. Band fan-out is bounded by the 8-bit key; the
    // verify join touches only candidates.
    Q("q86_sign_dup_pairs",
      (s, dir) => {
        import s.implicits._
        val sk = embeddings(s, dir)
          .select($"vec_id", expr(sketchExpr).as("sketch"))
        val bandCols = (0 until 8).map(b => s"$b, shiftright(sketch, ${b * 8}) & 255")
        val bands = sk.selectExpr("vec_id", "sketch",
          s"stack(8, ${bandCols.mkString(", ")}) AS (band, bv)")
        bands.as("a").join(bands.as("b"),
            $"a.band" === $"b.band" && $"a.bv" === $"b.bv" &&
            $"a.vec_id" < $"b.vec_id")
          .select($"a.vec_id".as("ida"), $"b.vec_id".as("idb"),
            $"a.sketch".as("ha"), $"b.sketch".as("hb"))
          .distinct()
          .select($"ida", $"idb",
            expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
          .filter($"hamming" <= 16)
          .orderBy($"ida", $"idb")
      },
      Some(s"""
        WITH $sketchCteSql,
        bands AS (SELECT vec_id, sketch, b AS band,
            (sketch >> (b * 8)) & 255 AS bv
          FROM sk, UNNEST(range(0, 8)) AS t(b)),
        cand AS (SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb,
                   a.sketch AS ha, b.sketch AS hb
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)
        SELECT ida, idb, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 16
        ORDER BY ida, idb""")),

    // ---- per-source curation funnel ----------------------------------
    // The dataset-card view of the whole curation pipeline: per source,
    // how many docs survive each stage — exact dedup (keep-min-doc_id
    // per text, q25/q58 stage 1), component-canonical near-dup removal
    // (q79's survivorship), and the quality gate (q58's shared
    // formula). Stages NEST (each flag implies the previous) so the
    // funnel is monotone per source. One pass over the corpus with
    // three left joins against doc_id sets that are each a small
    // fraction of the corpus; counting is a conditional aggregate, no
    // per-stage rescans. Oracle: the recursive-CTE component closure +
    // the shared quality CTE, a completely different evaluation
    // strategy over the same definitions.
    Q("q88_curation_funnel",
      (s, dir) => {
        import s.implicits._
        val docs = documents(s, dir)
        // keyed by content hash like q25/q58 — text never enters the
        // exchange (oracle groups raw text: collisions fail loudly)
        val exact = docs.groupBy(xxhash64($"text").as("h"))
          .agg(min($"doc_id").as("doc_id"))
          .select($"doc_id").withColumn("is_exact", lit(1L))
        val nonCanon = Dedup.components(s, dir)
          .filter($"doc_id" =!= $"component")
          .select($"doc_id").withColumn("is_noncanon", lit(1L))
        val qual = Dedup.qualityScores(s, dir)
          .filter(round($"quality", 6) >= 0.4)
          .select($"doc_id").withColumn("is_qual", lit(1L))
        docs.select($"doc_id", $"source")
          .join(exact, Seq("doc_id"), "left")
          .join(nonCanon, Seq("doc_id"), "left")
          .join(qual, Seq("doc_id"), "left")
          .withColumn("e", coalesce($"is_exact", lit(0L)))
          .withColumn("c", $"e" * when($"is_noncanon".isNull, lit(1L)).otherwise(lit(0L)))
          .withColumn("q", $"c" * coalesce($"is_qual", lit(0L)))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"e").as("n_exact"),
            sum($"c").as("n_canonical"), sum($"q").as("n_quality"))
          .orderBy($"source")
      },
      Some(s"""${Dedup.componentsCte},
        exact AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
        ${Dedup.qualityCte},
        flags AS (SELECT d.doc_id, d.source,
            CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS e,
            CASE WHEN e.doc_id IS NOT NULL AND NOT EXISTS (
                   SELECT 1 FROM comp c
                   WHERE c.doc_id = d.doc_id AND c.doc_id <> c.component)
                 THEN 1 ELSE 0 END AS c
          FROM documents d LEFT JOIN exact e ON d.doc_id = e.doc_id),
        qpass AS (SELECT doc_id FROM quality WHERE quality >= 0.4)
        SELECT source,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(e) AS BIGINT) AS n_exact,
          CAST(SUM(c) AS BIGINT) AS n_canonical,
          CAST(SUM(CASE WHEN flags.c = 1 AND q.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
        FROM flags LEFT JOIN qpass q ON flags.doc_id = q.doc_id
        GROUP BY source ORDER BY source"""))
  )
}
