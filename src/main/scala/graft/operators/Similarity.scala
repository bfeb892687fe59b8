package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over `embeddings` [EXT] (SURVEY.md §2B similarity
  * rows): cosine near-duplicate pairs, brute-force top-k ANN baseline,
  * and an IVF-style probed variant as the scale path.
  *
  * Kernel: the dot product / norm are Spark higher-order functions
  * (`aggregate` over `zip_with`) — codegen'd, no UDF, executed
  * columnar-batch-at-a-time. Arrays are cast to double first so the
  * fold is pure IEEE double arithmetic; the only cross-engine
  * tolerance needed is summation order, absorbed by rounding scores to
  * 1e-6 on *both* sides before any threshold/ordering decision.
  *
  * Scale design: no unblocked all-pairs anywhere.
  *  - near-dup pairs are blocked on `label` (the pre-assigned cluster /
  *    partition key) — an equi-join, shuffle-partitioned by label;
  *  - brute-force top-k broadcasts the (small) query set against the
  *    full corpus — a map-only pass, then a per-query top-k window;
  *  - the IVF variant explodes each query into its probe list and
  *    equi-joins on the cluster id — the classic inverted-file probe,
  *    reading only `probes/nlist` of the corpus per query.
  */
object Similarity {
  import Tables._

  /** vec_id, label, v (array<double>), nrm. The dot-product kernel is
    * the engine's codegen [[graft.functions.DotProduct]] expression —
    * bit-identical to the higher-order-function fold but ~an order of
    * magnitude faster (no CodegenFallback per element). */
  private def prepared(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    embeddings(s, dir)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(expr("dot_product(v, v)")))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))
  }

  private val dotExpr = "dot_product(av, bv)"

  /** Oracle-side prepared CTE: v as double list + norm. */
  private val prepCte = """
    WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
    n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)"""

  private val oracleDot = "list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])"

  def queries: Vector[Q] = Vector(
    // ---- near-duplicate pairs by cosine, blocked on label ------------
    // Scale contract: the equi-join on the block key distributes work
    // by block, but the comparison count is quadratic WITHIN a block —
    // fine while blocks are balanced, degrades on a mega-block (one
    // label owning most of the corpus). For skewed/unblocked corpora
    // use the hyperplane-LSH variant (q55): random-projection sign
    // buckets bound each bucket's pair count regardless of label skew.
    Q("q33_cosine_pairs",
      (s, dir) => {
        import s.implicits._
        val e = prepared(s, dir)
        val a = e.select($"vec_id".as("ida"), $"label", $"v".as("av"), $"nrm".as("na"))
        val b = e.select($"vec_id".as("idb"), $"label".as("labelb"), $"v".as("bv"), $"nrm".as("nb"))
        a.join(b, $"label" === $"labelb" && $"ida" < $"idb")
          .withColumn("cos", expr(dotExpr) / ($"na" * $"nb"))
          .filter(round($"cos", 6) >= 0.35)
          .select($"ida", $"idb", round($"cos", 6).as("cosine"))
          .orderBy($"ida", $"idb")
      },
      Some(s"""$prepCte,
        p AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
                $oracleDot / (a.nrm * b.nrm) AS cos
              FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT ida, idb, ROUND(cos, 6) AS cosine FROM p
        WHERE ROUND(cos, 6) >= 0.35
        ORDER BY ida, idb""")),

    // ---- brute-force cosine top-k (ANN baseline) ---------------------
    Q("q34_ann_topk",
      (s, dir) => {
        import s.implicits._
        val e = prepared(s, dir)
        val q = e.filter($"vec_id" < 50)
          .select($"vec_id".as("qid"), $"v".as("av"), $"nrm".as("na"))
        val c = e.select($"vec_id".as("cid"), $"v".as("bv"), $"nrm".as("nb"))
        val scored = broadcast(q).join(c, $"qid" =!= $"cid")
          .withColumn("cosr", round(expr(dotExpr) / ($"na" * $"nb"), 6))
        val w = Window.partitionBy($"qid").orderBy($"cosr".desc, $"cid")
        scored.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"qid", $"cid", $"cosr".as("cosine"), $"rank")
          .orderBy($"qid", $"rank")
      },
      Some(s"""$prepCte,
        scored AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
                     ROUND($oracleDot / (a.nrm * b.nrm), 6) AS cosr
                   FROM n a JOIN n b ON a.vec_id <> b.vec_id
                   WHERE a.vec_id < 50),
        ranked AS (SELECT qid, cid, cosr,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosr DESC, cid) AS rank
                   FROM scored)
        SELECT qid, cid, cosr AS cosine, rank FROM ranked
        WHERE rank <= 5 ORDER BY qid, rank""")),

    // ---- hyperplane-LSH bucketed near-dup (scale path #2) ------------
    // 8-bit signature: sign of the dot product with 8 fixed hyperplanes
    // (the first 8 corpus vectors — deterministic and oracle-sharable);
    // candidate pairs share the full signature (one equi-join on the
    // bucket id), then verify true cosine. At scale this reads each
    // bucket independently — no all-pairs stage anywhere.
    Q("q55_ann_lsh",
      (s, dir) => {
        import s.implicits._
        val e = prepared(s, dir)
        val planes = e.filter($"vec_id" < 8)
          .select($"vec_id".as("pid"), $"v".as("pv"))
        val sig = e.crossJoin(broadcast(planes))
          .withColumn("bit",
            when(expr("dot_product(v, pv)") > 0, expr("shiftleft(1L, CAST(pid AS INT))")).otherwise(0L))
          .groupBy($"vec_id").agg(sum($"bit").as("sig"))
        val withSig = e.join(sig, "vec_id")
        val a = withSig.select($"vec_id".as("ida"), $"sig", $"v".as("av"), $"nrm".as("na"))
        val b = withSig.select($"vec_id".as("idb"), $"sig".as("sigb"), $"v".as("bv"), $"nrm".as("nb"))
        a.join(b, $"sig" === $"sigb" && $"ida" < $"idb")
          .withColumn("cos", expr(dotExpr) / ($"na" * $"nb"))
          .filter(round($"cos", 6) >= 0.2)
          .select($"ida", $"idb", $"sig".cast(LongType).as("bucket"), round($"cos", 6).as("cosine"))
          .orderBy($"ida", $"idb")
      },
      Some(s"""$prepCte,
        planes AS (SELECT vec_id AS pid, v AS pv FROM n WHERE vec_id < 8),
        sig AS (SELECT e2.vec_id,
                  SUM(CASE WHEN list_sum([e2.v[i] * p.pv[i] for i in range(1, len(e2.v) + 1)]) > 0
                      THEN CAST(POWER(2, p.pid) AS BIGINT) ELSE 0 END) AS sg
                FROM n e2 CROSS JOIN planes p GROUP BY e2.vec_id),
        ws AS (SELECT n.vec_id, n.v, n.nrm, sig.sg FROM n JOIN sig ON n.vec_id = sig.vec_id),
        pairs AS (SELECT a.vec_id AS ida, b.vec_id AS idb, a.sg,
                    $oracleDot / (a.nrm * b.nrm) AS cos
                  FROM ws a JOIN ws b ON a.sg = b.sg AND a.vec_id < b.vec_id)
        SELECT ida, idb, CAST(sg AS BIGINT) AS bucket, ROUND(cos, 6) AS cosine
        FROM pairs WHERE ROUND(cos, 6) >= 0.2
        ORDER BY ida, idb""")),

    // ---- IVF-style probed top-k (scale path) -------------------------
    Q("q35_ann_ivf",
      (s, dir) => {
        import s.implicits._
        val e = prepared(s, dir)
        // each query probes 2 inverted lists: its own cluster and the next
        val q = e.filter($"vec_id" < 30)
          .select($"vec_id".as("qid"), $"label".as("qlabel"), $"v".as("av"), $"nrm".as("na"))
          .withColumn("probe", explode(array($"qlabel", ($"qlabel" + lit(1)) % lit(10))))
        val c = e.select($"vec_id".as("cid"), $"label".as("clabel"), $"v".as("bv"), $"nrm".as("nb"))
        val scored = broadcast(q).join(c, $"probe" === $"clabel" && $"qid" =!= $"cid")
          .withColumn("cosr", round(expr(dotExpr) / ($"na" * $"nb"), 6))
        val w = Window.partitionBy($"qid").orderBy($"cosr".desc, $"cid")
        scored.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"qid", $"cid", $"cosr".as("cosine"), $"rank")
          .orderBy($"qid", $"rank")
      },
      Some(s"""$prepCte,
        scored AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
                     ROUND($oracleDot / (a.nrm * b.nrm), 6) AS cosr
                   FROM n a JOIN n b
                     ON (b.label = a.label OR b.label = (a.label + 1) % 10)
                     AND a.vec_id <> b.vec_id
                   WHERE a.vec_id < 30),
        ranked AS (SELECT qid, cid, cosr,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosr DESC, cid) AS rank
                   FROM scored)
        SELECT qid, cid, cosr AS cosine, rank FROM ranked
        WHERE rank <= 5 ORDER BY qid, rank"""))
  )
}
