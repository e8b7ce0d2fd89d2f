package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis => TA}

/** Round-8 additions, both answering design questions the round's scale
  * probe raised: how to SHARD a corpus so dedup can run shard-locally,
  * and how small a minhash signature can get before the estimate
  * degrades (the persistent-index capacity dial).
  *
  * House rules as elsewhere: shared md5/permutation templates, integer
  * arithmetic near the gate, no negative integer division (Spark
  * truncates, DuckDB floors — clamp first), identical aliases, total
  * ORDER BY.
  */
object Round8Queries {

  private val normSql = TA.normTextSql
  private val P = Dedup.HashPrime

  type QFn = (SparkSession, String) => DataFrame

  /** The q21 oracle template verbatim (ExtQueries.minhashPairsCte):
    * ends in `verified(id_a, id_b, jaccard)` plus the intermediate
    * `mh(doc_id, m0..m7)` / `hst` / `d` tables, which q198 consumes. */
  private def minhashVerifiedCte: String = {
    val mhDefs = (0 until 8).map(s => s"${Dedup.minhashSql(s)} AS m$s")
      .mkString(",\n        ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band_idx, md5(CAST(m${2 * b} AS VARCHAR) || '|' || CAST(m${2 * b + 1} AS VARCHAR)) AS band_key FROM mh")
      .mkString("\n        UNION ALL ")
    s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
        i -> array_to_string(arr[i:i+2], ' '))) AS sh FROM d),
      hst AS (SELECT doc_id, list_distinct(list_transform(sh,
        g -> ('0x' || substr(md5(g), 1, 8))::BIGINT)) AS hs FROM sh),
      mh AS (SELECT doc_id,
        $mhDefs
        FROM hst),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_idx, band_key)
        WHERE a.doc_id < b.doc_id),
      verified AS (SELECT id_a, id_b,
        len(list_intersect(ha.hs, hb.hs)) / len(list_distinct(list_concat(ha.hs, hb.hs))) AS jaccard
        FROM cand
        JOIN hst ha ON ha.doc_id = id_a
        JOIN hst hb ON hb.doc_id = id_b)"""
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- multi-probe kNN graph (the recall complement to q158) ---------
    // The round-8 KnnDial sweep measured the single-table LSH tradeoff:
    // raising nProj splits candidate volume ÷2^Δ but collapses recall
    // (17.8% → 3.5% at ×10 scale), because a true neighbor differing in
    // ONE sign bit lands one bucket over. Multi-probe recovers exactly
    // those: every node ALSO probes its nProj Hamming-1 buckets, so the
    // candidate join costs (nProj+1)× the single-table volume at the
    // SAME bucketing — a net win whenever the bucket split it enables
    // (2^Δ) exceeds nProj+1. Same bucket equi-join shape as q158 (no
    // broadcast: both sides shuffle on the bucket key, which is the
    // 100 TB-safe form for an every-node query set), distinct on the
    // (q, c) pair because probe buckets overlap, then the identical
    // top-3 + mutual-edge construction.
    ("q200_knn_graph_multiprobe", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val prepared = Similarity.prepare(
        Tables.spread(Tables.t(s, dir, "embeddings")), "vec_id", "embedding")
      val projs = Similarity.OracleProjs
      val b = prepared.withColumn("bucket", Similarity.lshBucket(col("qvec"), projs))
      val probeList = array((lit(0) +: projs.indices.map(j => lit(1 << j))): _*)
      val q = b.withColumn("__flip", explode(probeList))
        .select(expr("bucket ^ __flip").as("bucket"),
          $"id".as("q_id"), $"qvec".as("q_vec"), $"n2".as("q_n2"))
      val c = b.select($"bucket", $"id".as("c_id"),
        $"qvec".as("c_vec"), $"n2".as("c_n2"))
      val scored = q.join(c, "bucket").filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id",
          Similarity.cosine(Similarity.dot($"q_vec", $"c_vec"), $"q_n2", $"c_n2")
            .as("cos_sim"))
        .distinct()
      val w = Window.partitionBy($"q_id").orderBy(desc("cos_sim"), $"c_id")
      val knn = scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      val rev = knn.select($"c_id".as("q_id"), $"q_id".as("c_id"), lit(1).as("m"))
      knn.join(rev, Seq("q_id", "c_id"), "left")
        .select($"q_id", $"rnk", $"c_id", $"cos_sim",
          coalesce($"m", lit(0)).cast("long").as("mutual"))
        .orderBy("q_id", "rnk")
    }, Some(s"""
      WITH ${Similarity.prepareSql},
      b AS (SELECT vec_id, qvec, n2, ${Similarity.lshBucketSql} AS bucket FROM n),
      q AS (SELECT xor(bucket, flip) AS bucket, vec_id AS q_id, qvec AS q_vec, n2 AS q_n2
        FROM b, unnest([0, 1, 2, 4, 8]) AS t(flip)),
      scored AS (SELECT DISTINCT q.q_id, c.vec_id AS c_id,
        list_dot_product(q.q_vec, c.qvec) / sqrt(q.q_n2 * c.n2) AS cos_sim
        FROM b c JOIN q ON c.bucket = q.bucket AND q.q_id <> c.vec_id),
      r AS (SELECT q_id, c_id, cos_sim,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
        FROM scored),
      knn AS (SELECT q_id, rnk, c_id, cos_sim FROM r WHERE rnk <= 3)
      SELECT k.q_id, k.rnk, k.c_id, k.cos_sim,
        CAST(CASE WHEN m.q_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS mutual
      FROM knn k LEFT JOIN knn m ON m.q_id = k.c_id AND m.c_id = k.q_id
      ORDER BY k.q_id, k.rnk""")),

    // ----- shard-locality audit for distributed dedup --------------------
    // The 100 TB partition-design question, quantified: dedup run
    // SHARD-LOCALLY (each shard deduped independently — embarrassingly
    // parallel, no global shuffle) only finds duplicate pairs whose two
    // members hash to the same shard. This audit takes the q21 verified
    // near-dup pairs as ground truth and measures the intra-shard
    // fraction under two 16-shard policies: 'hash16' (uniform md5 of
    // the doc id — the naive layout; expected intra ≈ 1/16, i.e. the
    // audit PROVES random sharding forfeits ~94% of dup pairs) and
    // 'band' (shard by the doc's first LSH band key — the
    // locality-preserving layout, where band-equal pairs land together
    // by construction and recall is bounded only by pairs caught via
    // the other bands). The pair list is rare-event output (orders
    // smaller than the corpus) and the policy comparison is one explode
    // + aggregate over it, so the audit costs nothing beyond the dedup
    // it audits.
    ("q198_shard_locality", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id".as("id"),
          graft.functions.WordShingleHash32(TA.normText($"text"), 3).as("hs"))
      val pairs = Dedup.minhashLshPairsHashed(docs, nBands = 4, threshold = 0.5)
        .select($"id_a", $"id_b")
      val keyed = docs.select($"id",
        (conv(substring(md5(concat(lit("sh|"), $"id".cast("string"))), 1, 8), 16, 10)
          .cast("long") % 16).as("shard_hash"),
        (conv(substring(md5(concat_ws("|",
            Dedup.minhashInt($"hs", 0).cast("string"),
            Dedup.minhashInt($"hs", 1).cast("string"))), 1, 8), 16, 10)
          .cast("long") % 16).as("shard_band"))
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      val j = pairs
        .join(keyed.toDF("id_a", "ha", "ba"), Seq("id_a"))
        .join(keyed.toDF("id_b", "hb", "bb"), Seq("id_b"))
      j.select(explode(array(
          struct(lit("band").as("policy"),
            when($"ba" === $"bb", 1L).otherwise(0L).as("intra")),
          struct(lit("hash16").as("policy"),
            when($"ha" === $"hb", 1L).otherwise(0L).as("intra")))).as("p"))
        .select($"p.policy".as("policy"), $"p.intra".as("intra"))
        .groupBy($"policy")
        .agg(count(lit(1)).as("n_pairs"), sum($"intra").as("n_intra"))
        .crossJoin(broadcast(nd))
        .select($"policy", $"n_docs", $"n_pairs", $"n_intra",
          expr("(1000000 * n_intra) div n_pairs").as("intra_micro"))
        .orderBy($"policy")
    }, Some(s"""
      $minhashVerifiedCte,
      pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.5),
      keyed AS (SELECT doc_id,
          ('0x' || substr(md5('sh|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard_hash,
          ('0x' || substr(md5(CAST(m0 AS VARCHAR) || '|' || CAST(m1 AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard_band
        FROM mh),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
      j AS (SELECT a.shard_hash AS ha, a.shard_band AS ba,
          b.shard_hash AS hb, b.shard_band AS bb
        FROM pairs p JOIN keyed a ON a.doc_id = p.id_a JOIN keyed b ON b.doc_id = p.id_b),
      pol AS (SELECT 'band' AS policy, CASE WHEN ba = bb THEN 1 ELSE 0 END AS intra FROM j
        UNION ALL SELECT 'hash16' AS policy, CASE WHEN ha = hb THEN 1 ELSE 0 END FROM j)
      SELECT policy, nd.n_docs, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(intra) AS BIGINT) AS n_intra,
        (1000000 * CAST(sum(intra) AS BIGINT)) // CAST(count(*) AS BIGINT) AS intra_micro
      FROM pol CROSS JOIN nd GROUP BY policy, nd.n_docs ORDER BY policy""")),

    // ----- watermark-lateness profile (streaming-design table) -----------
    // Choosing a Structured Streaming watermark horizon is a data
    // question — how late does this stream actually run? — usually
    // answered by guessing. This profile answers it from the data:
    // per-key (user) arrival order is the event_id sequence, lateness of
    // an event is the running max event-time over that order minus its
    // own event-time, and the output is the horizon ladder {0 s, 1 s,
    // 10 s, 60 s, 600 s, 3600 s} with how many events a watermark at
    // that horizon keeps. Per-KEY lateness underestimates the global
    // single-stream form (Spark's watermark is global: the running max
    // spans all keys), so the table is the optimistic bound — the
    // per-key windows parallelize over users, nothing global sorts, and
    // at 100 TB that is the only computable form; the gap closes as the
    // key count grows because the global max is almost surely advanced
    // by some key between any key's consecutive events.
    ("q201_watermark_lateness", (s: SparkSession, dir: String) => {
      import s.implicits._
      val raw = Tables.t(s, dir, "events")
      // the generator has emitted ts as TIMESTAMP, TIMESTAMP_NTZ, and
      // TIMESTAMP(NANOS) over time (TESTDATA gotcha) — normalize to
      // epoch micros; lateness is a DIFFERENCE, so any constant session
      // offset a cast introduces cancels
      val tusCol = raw.schema("ts").dataType.typeName match {
        case "timestamp_ntz" => unix_micros($"ts".cast("timestamp"))
        case _ => unix_micros($"ts")
      }
      val ev = raw.select($"event_id", $"user_id", tusCol.as("tus"))
      val late = ev.withColumn("late_s", expr(
        "(max(tus) OVER (PARTITION BY user_id ORDER BY event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus) div 1000000"))
      val tot = late.agg(count(lit(1)).as("n"))
      val horizons = Seq(0L, 1L, 10L, 60L, 600L, 3600L)
      late.select(explode(array(horizons.map(hz =>
          struct(lit(hz).as("horizon_s"),
            when($"late_s" <= hz, 1L).otherwise(0L).as("ok"))): _*)).as("p"))
        .select($"p.horizon_s".as("horizon_s"), $"p.ok".as("ok"))
        .groupBy($"horizon_s")
        .agg(sum($"ok").as("n_on_time"))
        .crossJoin(broadcast(tot))
        .select($"horizon_s", $"n_on_time", ($"n" - $"n_on_time").as("n_dropped"),
          expr("(1000000 * n_on_time) div n").as("on_time_micro"))
        .orderBy($"horizon_s")
    }, Some("""
      WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events),
      late AS (SELECT (max(tus) OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus) // 1000000 AS late_s
        FROM ev),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM late),
      h AS (SELECT unnest([0, 1, 10, 60, 600, 3600]) AS horizon_s),
      agg AS (SELECT h.horizon_s,
          CAST(sum(CASE WHEN late.late_s <= h.horizon_s THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time
        FROM late CROSS JOIN h GROUP BY h.horizon_s)
      SELECT CAST(horizon_s AS BIGINT) AS horizon_s, n_on_time,
        tot.n - n_on_time AS n_dropped,
        (1000000 * n_on_time) // tot.n AS on_time_micro
      FROM agg CROSS JOIN tot ORDER BY horizon_s""")),

    // ----- KMV sketch merge: mergeability, proven relationally -----------
    // The property every distributed sketch lives on: bottom-k of the
    // UNION of per-source bottom-k sketches equals bottom-k of the full
    // set (any of the k globally smallest hashes is necessarily inside
    // its own source's bottom-k). This operator computes the corpus
    // distinct-SHINGLE estimate (the 3-gram universe — 16k+ values at
    // test SF, where the word vocab is too small for k=64) BOTH ways —
    // directly, and by merging the
    // per-source sketches — with the same q53 estimator
    // (k−1)·2⁴⁸ / h_(k); the gate pins them equal. At 100 TB the
    // per-source sketches are the persisted incremental state (64 longs
    // per source per batch) and the merge path touches k·|sources| rows,
    // never the corpus: this query IS the re-estimation a mixing planner
    // runs after every ingest. Both bottom-k cuts are ORDER BY + LIMIT —
    // TakeOrderedAndProject, per-partition top-k then one k-row merge,
    // no single-partition vocabulary sort anywhere.
    ("q202_kmv_merge", (s: SparkSession, dir: String) => {
      import s.implicits._
      val k = 64
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(TA.shingles($"text", 3)).as("tok"))
        .distinct()
      val h = st.withColumn("h",
        conv(substring(md5($"tok"), 1, 12), 16, 10).cast("long"))
        .localCheckpoint() // consumed by 3 branches (direct, sketch, exact)
      val wS = Window.partitionBy($"source").orderBy($"h", $"tok")
      val sketches = h.withColumn("rn", row_number().over(wS))
        .filter($"rn" <= k).select($"h", $"tok")
      val mergedKth = sketches.distinct().orderBy($"h", $"tok").limit(k)
        .agg(max($"h").as("kh"))
      val directKth = h.select($"h", $"tok").distinct().orderBy($"h", $"tok").limit(k)
        .agg(max($"h").as("kh"))
      val exact = h.select($"tok").distinct().agg(count(lit(1)).as("n_exact"))
      val ns = h.select($"source").distinct().agg(count(lit(1)).as("n_sources"))
      ns.crossJoin(exact)
        .crossJoin(directKth.select(
          (lit((k - 1).toDouble) * lit(math.pow(2, 48)) / $"kh".cast("double"))
            .as("est_direct")))
        .crossJoin(mergedKth.select(
          (lit((k - 1).toDouble) * lit(math.pow(2, 48)) / $"kh".cast("double"))
            .as("est_merged")))
        .select($"n_sources", $"n_exact", $"est_direct", $"est_merged")
    }, Some(s"""
      WITH d AS (SELECT source, string_split($normSql, ' ') AS arr FROM documents),
      st AS (SELECT DISTINCT source, tok
        FROM (SELECT source, unnest(list_transform(range(1, greatest(len(arr) - 2, 1) + 1),
          i -> array_to_string(arr[i:i+2], ' '))) AS tok FROM d)),
      h AS (SELECT source, tok, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h FROM st),
      sk AS (SELECT h, tok FROM (SELECT h, tok,
          row_number() OVER (PARTITION BY source ORDER BY h, tok) AS rn FROM h)
        WHERE rn <= 64),
      mk AS (SELECT max(h) AS kh FROM (SELECT DISTINCT h, tok FROM sk ORDER BY h, tok LIMIT 64)),
      dk AS (SELECT max(h) AS kh FROM (SELECT DISTINCT h, tok FROM h ORDER BY h, tok LIMIT 64)),
      x AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_exact FROM h),
      nsrc AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM h)
      SELECT nsrc.n_sources, x.n_exact,
        63.0 * 281474976710656 / dk.kh AS est_direct,
        63.0 * 281474976710656 / mk.kh AS est_merged
      FROM nsrc CROSS JOIN x CROSS JOIN dk CROSS JOIN mk""")),

    // ----- b-bit minhash: the signature-store capacity dial ---------------
    // q194's 8-perm source signatures kept as 64-bit values; at 100 TB
    // the persistent dedup/similarity index stores one signature per
    // document, so bytes-per-perm is the capacity dial. b-bit minhash
    // (Li & König, 2010) keeps only the LOWEST b bits of each perm —
    // 16× smaller at b=4 — and corrects the estimate for accidental
    // low-bit collisions: with collision baseline C = 2^-b,
    //   Ĵ = (match_frac − C) / (1 − C),
    // which at b=4, 8 perms clears to the integer form
    //   est = 1e6 · max(0, 2·matches − 1) / 15
    // (clamped BEFORE the division — Spark's div truncates while
    // DuckDB's // floors, so a negative numerator would silently
    // diverge). Emitted next to the full-width estimate and the exact
    // token-set Jaccard: the three-way comparison IS the sizing table —
    // what resolution each storage tier buys at |sources|² cost, never
    // touching content.
    ("q199_bbit_minhash", (s: SparkSession, dir: String) => {
      import s.implicits._
      val st = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", explode(split(TA.normText($"text"), " ")).as("tok"))
        .distinct()
      val h = st.withColumn("h",
        conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long"))
      val minCols: Seq[Column] = (0 until 8).map { k =>
        val (a, b) = Dedup.permConsts(k)
        min(($"h" * a + b) % P).as(s"m$k")
      }
      val sigs = h.groupBy($"source")
        .agg(count(lit(1)).as("n_toks"), minCols: _*)
      val a = sigs.toDF(sigs.columns.map(c => s"a_$c"): _*)
      val b = sigs.toDF(sigs.columns.map(c => s"b_$c"): _*)
      val fullM = (0 until 8).map(k =>
        when(col(s"a_m$k") === col(s"b_m$k"), 1).otherwise(0)).reduce(_ + _)
      val bbitM = (0 until 8).map(k =>
        when(col(s"a_m$k") % 16 === col(s"b_m$k") % 16, 1).otherwise(0)).reduce(_ + _)
      val pairs = a.join(b, col("a_source") < col("b_source"))
        .select(col("a_source").as("source_a"), col("b_source").as("source_b"),
          col("a_n_toks").as("n_a"), col("b_n_toks").as("n_b"),
          fullM.cast("long").as("full_matches"),
          bbitM.cast("long").as("bbit_matches"))
      val inter = st.toDF("source_a", "tok")
        .join(st.toDF("source_b", "tok"), Seq("tok"))
        .filter($"source_a" < $"source_b")
        .groupBy($"source_a", $"source_b").agg(count(lit(1)).as("inter"))
      pairs.join(inter, Seq("source_a", "source_b"), "left")
        .na.fill(0L, Seq("inter"))
        .select($"source_a", $"source_b", $"full_matches", $"bbit_matches",
          ($"full_matches" * 125000).as("est_full_micro"),
          expr("(1000000 * greatest(0, 2 * bbit_matches - 1)) div 15").as("est_bbit_micro"),
          expr("(1000000 * inter) div (n_a + n_b - inter)").as("exact_micro"))
        .orderBy($"source_a", $"source_b")
    }, Some {
      val mins = (0 until 8).map { k =>
        val (a, b) = Dedup.permConsts(k)
        s"min((h * $a + $b) % $P) AS m$k"
      }.mkString(", ")
      val eqFull = (0 until 8).map(k =>
        s"(CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END)").mkString(" + ")
      val eqBbit = (0 until 8).map(k =>
        s"(CASE WHEN a.m$k % 16 = b.m$k % 16 THEN 1 ELSE 0 END)").mkString(" + ")
      s"""
      WITH st AS (SELECT DISTINCT source, tok
        FROM (SELECT source, unnest(string_split($normSql, ' ')) AS tok FROM documents)),
      h AS (SELECT source, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM st),
      sig AS (SELECT source, CAST(count(*) AS BIGINT) AS n_toks, $mins
        FROM h GROUP BY 1),
      pairs AS (SELECT a.source AS source_a, b.source AS source_b,
          a.n_toks AS n_a, b.n_toks AS n_b,
          CAST($eqFull AS BIGINT) AS full_matches,
          CAST($eqBbit AS BIGINT) AS bbit_matches
        FROM sig a JOIN sig b ON a.source < b.source),
      i AS (SELECT x.source AS source_a, y.source AS source_b,
          CAST(count(*) AS BIGINT) AS inter
        FROM st x JOIN st y ON x.tok = y.tok AND x.source < y.source GROUP BY 1, 2)
      SELECT p.source_a, p.source_b, p.full_matches, p.bbit_matches,
        p.full_matches * 125000 AS est_full_micro,
        (1000000 * greatest(0, 2 * p.bbit_matches - 1)) // 15 AS est_bbit_micro,
        (1000000 * CAST(coalesce(i.inter, 0) AS BIGINT))
          // (p.n_a + p.n_b - CAST(coalesce(i.inter, 0) AS BIGINT)) AS exact_micro
      FROM pairs p LEFT JOIN i ON p.source_a = i.source_a AND p.source_b = i.source_b
      ORDER BY 1, 2"""
    })
  )
}
