package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{TextAnalysis => TA}

/** Round-8 batch 14: tokenizer induction (BPE merges), training-sequence
  * packing, corpus snapshot diff, content-defined chunk dedup,
  * boilerplate-block detection, and capped water-filling budget
  * allocation — the tokenizer/packing/versioning slice of the
  * training-data pipeline.
  *
  * House rules as elsewhere: integer arithmetic at every gate, 128-bit
  * (DECIMAL(38,0)/HUGEINT) cross-products where products of corpus
  * counts appear, identical aliases both sides, total ORDER BY.
  */
object Round8nQueries {

  private val normSql = TA.normTextSql

  type QFn = (SparkSession, String) => DataFrame

  /** One BPE merge round as a DuckDB CTE block (see q245). The greedy
    * left-to-right merge is gaps-and-islands: runs of consecutive
    * matched positions keep odd ranks only (adjacent matches exist only
    * when pa == pb, e.g. "aaaa" → "aa","aa" not "aa","a","a"). */
  private def bpeRoundSql(r: Int): String = {
    val p = if (r == 1) "s0" else s"s${r - 1}"
    s"""
      pr$r AS (SELECT w, wf, pos, sym,
          lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM $p),
      top$r AS (SELECT sym AS pa, nxt AS pb, CAST(sum(wf) AS BIGINT) AS weight
        FROM pr$r WHERE nxt IS NOT NULL GROUP BY 1, 2
        ORDER BY weight DESC, pa, pb LIMIT 1),
      m$r AS (SELECT b.w, b.wf, b.pos, b.sym, b.nxt, t.pa, t.pb, t.weight,
          CASE WHEN b.sym = t.pa AND b.nxt = t.pb THEN 1 ELSE 0 END AS mat
        FROM pr$r b CROSS JOIN top$r t),
      i$r AS (SELECT *, sum(mat) OVER (PARTITION BY w ORDER BY pos
          ROWS UNBOUNDED PRECEDING) AS mrn FROM m$r),
      j$r AS (SELECT *, CASE WHEN mat = 1 THEN pos - mrn END AS island FROM i$r),
      k$r AS (SELECT *, mrn - min(CASE WHEN mat = 1 THEN mrn END)
          OVER (PARTITION BY w, island) + 1 AS rim FROM j$r),
      l$r AS (SELECT *, (mat = 1 AND rim % 2 = 1) AS keep FROM k$r),
      f$r AS (SELECT *, coalesce(lag(keep) OVER (PARTITION BY w ORDER BY pos),
          FALSE) AS consumed FROM l$r),
      s$r AS (SELECT w, wf,
          CAST(row_number() OVER (PARTITION BY w ORDER BY pos) AS BIGINT) AS pos,
          CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
        FROM f$r WHERE NOT consumed),
      o$r AS (SELECT CAST($r AS BIGINT) AS round, t.pa AS sym_a, t.pb AS sym_b,
          t.weight,
          (SELECT CAST(count(DISTINCT sym) AS BIGINT) FROM s$r) AS vocab_size
        FROM top$r t)"""
  }

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- BPE tokenizer induction: first 3 merges ------------------------
    // Byte-pair-encoding vocabulary induction, the word-count
    // formulation every production tokenizer trainer uses (Sennrich
    // 2016; HF tokenizers): the ONLY corpus-sized pass is the word
    // frequency aggregate — every merge round then works on the melted
    // (word, pos, symbol) table, whose size is Σ|word| over the DISTINCT
    // vocabulary, not the corpus. Each round: pair weights via one lead
    // window + one aggregate, top pair by (weight desc, pair lex), then
    // the greedy left-to-right in-word merge as gaps-and-islands (runs
    // of consecutive matches — only possible when pa == pb — keep odd
    // ranks; the following position is consumed). Round count is the
    // fixed k = 3, driver-composed with a localCheckpoint barrier per
    // round, data never leaves the DAG. At 100 TB the word-count pass
    // maintains incrementally and the merge loop's input is vocabulary-
    // bounded (millions of rows, not corpus-bounded) — this is exactly
    // why tokenizer training is feasible on web-scale corpora.
    ("q245_bpe_merges", (s: SparkSession, dir: String) => {
      import s.implicits._
      val words = Tables.spread(Tables.t(s, dir, "documents"))
        .select(explode(split(TA.normText($"text"), " ")).as("w"))
        .filter(length($"w") > 0)
        .groupBy($"w").agg(count(lit(1)).as("wf"))
      var syms = words
        .select($"w", $"wf", explode(expr("sequence(1, length(w))")).as("pos"))
        .select($"w", $"wf", $"pos".cast("long").as("pos"),
          expr("substring(w, pos, 1)").as("sym"))
        .localCheckpoint()
      val wWin = Window.partitionBy($"w").orderBy($"pos")
      var out: DataFrame = null
      for (round <- 1 to 3) {
        val withNext = syms.withColumn("nxt", lead($"sym", 1).over(wWin))
        val top = withNext.filter($"nxt".isNotNull)
          .groupBy($"sym", $"nxt").agg(sum($"wf").as("weight"))
          .orderBy(desc("weight"), $"sym", $"nxt").limit(1)
          .select($"sym".as("pa"), $"nxt".as("pb"), $"weight")
        val m = withNext.crossJoin(broadcast(top))
          .withColumn("mat",
            ($"sym" === $"pa" && $"nxt" === $"pb").cast("int"))
          .withColumn("mrn", sum($"mat").over(wWin))
        val kept = m
          .withColumn("island", when($"mat" === 1, $"pos" - $"mrn"))
          .withColumn("rim", $"mrn" -
            min(when($"mat" === 1, $"mrn"))
              .over(Window.partitionBy($"w", $"island")) + 1)
          .withColumn("keep", $"mat" === 1 && $"rim" % 2 === 1)
        val merged = kept
          .withColumn("consumed",
            coalesce(lag($"keep", 1).over(wWin), lit(false)))
          .filter(!$"consumed")
          .select($"w", $"wf",
            row_number().over(wWin).cast("long").as("pos"),
            when($"keep", concat($"sym", $"nxt")).otherwise($"sym").as("sym"))
          .localCheckpoint()
        val vocabAfter = merged.agg(countDistinct($"sym").as("vocab_size"))
        val row = top.crossJoin(broadcast(vocabAfter))
          .select(lit(round.toLong).as("round"), $"pa".as("sym_a"),
            $"pb".as("sym_b"), $"weight", $"vocab_size")
        out = if (out == null) row else out.unionByName(row)
        syms = merged
      }
      out.orderBy($"round")
    }, Some(s"""
      WITH words AS (SELECT w, CAST(count(*) AS BIGINT) AS wf FROM
          (SELECT unnest(string_split($normSql, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY 1),
      s0 AS (SELECT w, wf, CAST(i AS BIGINT) AS pos,
          substr(w, CAST(i AS INT), 1) AS sym
        FROM words, unnest(range(1, len(w) + 1)) AS t(i)),
      ${bpeRoundSql(1)},
      ${bpeRoundSql(2)},
      ${bpeRoundSql(3)}
      SELECT * FROM o1 UNION ALL SELECT * FROM o2 UNION ALL SELECT * FROM o3
      ORDER BY round""")),

    // ----- training-sequence packing audit (concat-and-chunk) -------------
    // The packing shape LM training actually uses: concatenate documents
    // in a deterministic shard order, chunk into fixed 256-token
    // sequences. Sequences, boundary-split documents, and tail waste all
    // fall out of ONE cumulative window per source — a doc spanning a
    // multiple of 256 is split, counted via floor((cum-1)/256) −
    // floor(start/256) without materializing any sequence. Per-source
    // windows are the shard form: at 100 TB each shard packs
    // independently (the window key IS the shard key), so the audit is
    // embarrassingly parallel and never shuffles tokens — only the
    // per-doc length aggregate touches text.
    ("q246_sequence_packing", (s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source", TA.normText($"text").as("nt"))
        .select($"doc_id", $"source",
          when($"nt" === "", lit(0L))
            .otherwise(size(split($"nt", " ")).cast("long")).as("len"))
        .filter($"len" > 0)
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val x = d.withColumn("cum", sum($"len").over(w))
        .withColumn("strt", $"cum" - $"len")
        .withColumn("nb", expr("(cum - 1) div 256 - strt div 256"))
      x.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"len").as("n_tokens"),
          sum(when($"nb" > 0, 1L).otherwise(0L)).as("n_docs_split"),
          sum($"nb").as("n_crossings"))
        .select($"source", $"n_docs", $"n_tokens",
          expr("(n_tokens + 255) div 256").as("n_sequences"),
          $"n_docs_split", $"n_crossings",
          expr("1000000 * n_docs_split div n_docs").as("split_rate_micro"),
          expr("((n_tokens + 255) div 256) * 256 - n_tokens").as("tail_waste"))
        .orderBy($"source")
    }, Some(s"""
      WITH d AS (SELECT doc_id, source,
          CASE WHEN $normSql = '' THEN 0
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) END AS len
        FROM documents),
      f AS (SELECT * FROM d WHERE len > 0),
      c AS (SELECT *, sum(len) OVER (PARTITION BY source ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) AS cum FROM f),
      x AS (SELECT *, cum - len AS strt,
          (cum - 1) // 256 - strt // 256 AS nb FROM c)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len) AS BIGINT) AS n_tokens,
        CAST((sum(len) + 255) // 256 AS BIGINT) AS n_sequences,
        CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_split,
        CAST(sum(nb) AS BIGINT) AS n_crossings,
        CAST(1000000 * sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) // count(*)
          AS BIGINT) AS split_rate_micro,
        CAST(((sum(len) + 255) // 256) * 256 - sum(len) AS BIGINT) AS tail_waste
      FROM x GROUP BY 1 ORDER BY 1""")),

    // ----- corpus snapshot diff (dataset versioning) ----------------------
    // The delta audit between two corpus snapshots — the operation every
    // versioned data lake runs before retraining: which documents were
    // added / removed / changed / untouched, per source. v2 is derived
    // deterministically from v1 (drop doc_id%11=3, edit doc_id%7=2,
    // add a derived doc for doc_id%13=5) so the oracle sees the same
    // pair. The diff itself is the production shape: ONE full outer join
    // on the snapshot key comparing md5 content fingerprints — text
    // never crosses the shuffle, only 32-byte hashes, and the join key
    // is the natural partition key of both snapshots, so at 100 TB this
    // is a co-partitioned zipper with hash-only network traffic.
    ("q247_corpus_diff", (s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.t(s, dir, "documents").select($"doc_id", $"source", $"text")
      val v2 = base.filter($"doc_id" % 11 =!= 3)
        .select($"doc_id", $"source",
          when($"doc_id" % 7 === 2, concat($"text", lit(" v2")))
            .otherwise($"text").as("text"))
        .unionByName(base.filter($"doc_id" % 13 === 5)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"source",
            concat(lit("new "), $"text").as("text")))
      val l = base.select($"doc_id".as("id1"), $"source".as("source1"),
        md5($"text").as("h1"))
      val r = v2.select($"doc_id".as("id2"), $"source".as("source2"),
        md5($"text").as("h2"))
      l.join(r, $"id1" === $"id2", "full_outer")
        .select(coalesce($"source1", $"source2").as("source"),
          coalesce($"id1", $"id2").as("doc_id"),
          when($"id1".isNull, lit("added"))
            .when($"id2".isNull, lit("removed"))
            .when($"h1" =!= $"h2", lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
        .groupBy($"source", $"status")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("idsum"))
        .orderBy($"source", $"status")
    }, Some("""
      WITH base AS (SELECT doc_id, source, text FROM documents),
      v2 AS (SELECT doc_id, source,
          CASE WHEN doc_id % 7 = 2 THEN text || ' v2' ELSE text END AS text
        FROM base WHERE doc_id % 11 <> 3
        UNION ALL
        SELECT doc_id + 1000000, source, 'new ' || text FROM base
        WHERE doc_id % 13 = 5),
      l AS (SELECT doc_id AS id1, source AS source1, md5(text) AS h1 FROM base),
      r AS (SELECT doc_id AS id2, source AS source2, md5(text) AS h2 FROM v2),
      j AS (SELECT coalesce(source1, source2) AS source,
          coalesce(id1, id2) AS doc_id,
          CASE WHEN id1 IS NULL THEN 'added'
               WHEN id2 IS NULL THEN 'removed'
               WHEN h1 <> h2 THEN 'changed' ELSE 'unchanged' END AS status
        FROM l FULL OUTER JOIN r ON id1 = id2)
      SELECT source, status, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(doc_id) AS BIGINT) AS idsum
      FROM j GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- content-defined chunk dedup (CDC economics) --------------------
    // Rolling-boundary chunking, the storage-dedup primitive (Rabin/gear
    // CDC as in backup systems and chunk-level lakehouse dedupe): a
    // chunk boundary falls AFTER any token whose hash ≡ 0 (mod 8) —
    // boundaries depend only on local content, so an insertion early in
    // a document cannot reshift every later chunk, which is the whole
    // point vs fixed-width chunking. Chunk ids are one cumulative window
    // per doc; chunk fingerprints are md5 over the ordered token run;
    // dedup economics (duplicate ratio, tokens saved) aggregate per
    // source. Every shuffle key carries doc_id or (source, fp) — at
    // 100 TB chunking is map-side per document and the economics
    // aggregate is a standard two-level groupBy on bounded keys.
    ("q248_cdc_chunking", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source",
          posexplode(split(TA.normText($"text"), " ")).as(Seq("pos", "tok")))
        .filter(length($"tok") > 0)
      val win = Window.partitionBy($"doc_id").orderBy($"pos")
      val wb = toks
        .withColumn("b",
          (conv(substring(md5(concat(lit("cdc|"), $"tok")), 1, 8), 16, 10)
            .cast("long") % 8 === 0).cast("int"))
        .withColumn("chunk", coalesce(
          sum($"b").over(win.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val chunks = wb.groupBy($"doc_id", $"source", $"chunk")
        .agg(count(lit(1)).as("clen"),
          md5(array_join(
            expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
            " ")).as("fp"))
      chunks.groupBy($"source", $"fp")
        .agg(count(lit(1)).as("cnt"), max($"clen").as("clen"))
        .groupBy($"source")
        .agg(sum($"cnt").as("n_chunks"), count(lit(1)).as("n_distinct"),
          sum(($"cnt" - 1) * $"clen").as("saved_tokens"),
          sum($"cnt" * $"clen").as("tok_total"))
        .select($"source", $"n_chunks", $"n_distinct",
          expr("1000000 * (n_chunks - n_distinct) div n_chunks")
            .as("dup_ratio_micro"),
          $"saved_tokens",
          expr("1000000 * tok_total div n_chunks").as("avg_len_micro"))
        .orderBy($"source")
    }, Some(s"""
      WITH base AS (SELECT doc_id, source, string_split($normSql, ' ') AS a
        FROM documents),
      toks AS (SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS pos, a[i] AS tok
        FROM base, unnest(range(1, len(a) + 1)) AS t(i) WHERE len(a[i]) > 0),
      wb AS (SELECT *, CASE WHEN ('0x' || substr(md5('cdc|' || tok), 1, 8))::BIGINT
            % 8 = 0 THEN 1 ELSE 0 END AS b FROM toks),
      wc AS (SELECT *, coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk FROM wb),
      chunks AS (SELECT doc_id, source, chunk, CAST(count(*) AS BIGINT) AS clen,
          md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
        FROM wc GROUP BY 1, 2, 3),
      pf AS (SELECT source, fp, CAST(count(*) AS BIGINT) AS cnt,
          max(clen) AS clen FROM chunks GROUP BY 1, 2)
      SELECT source, CAST(sum(cnt) AS BIGINT) AS n_chunks,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(1000000 * (sum(cnt) - count(*)) // sum(cnt) AS BIGINT)
          AS dup_ratio_micro,
        CAST(sum((cnt - 1) * clen) AS BIGINT) AS saved_tokens,
        CAST(1000000 * sum(cnt * clen) // sum(cnt) AS BIGINT) AS avg_len_micro
      FROM pf GROUP BY 1 ORDER BY 1""")),

    // ----- boilerplate block detection ------------------------------------
    // The CCNet-style boilerplate screen re-expressed for a corpus with
    // no line structure: non-overlapping 3-token blocks (the block size
    // is a dial; 3 keeps the block space small enough that the
    // generator's vocabulary actually produces cross-document repeats at
    // test SF — on web text it would be a sentence or line hash), a
    // block is boilerplate within a source when it appears in ≥ 2
    // distinct documents, and the audit reports how much of the corpus
    // the repeated blocks occupy plus the most-widespread block. All
    // aggregation is (source, block)-keyed — the classic duplicated-line
    // removal pass runs map-side per doc then one bounded groupBy, so
    // the shape survives 100 TB; the flagged set itself is what a
    // cleaning pass would broadcast back to strip.
    ("q249_boilerplate_blocks", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"doc_id", $"source",
          posexplode(split(TA.normText($"text"), " ")).as(Seq("pos", "tok")))
        .filter(length($"tok") > 0)
        .withColumn("blk", expr("pos div 3"))
      val blocks = toks.groupBy($"doc_id", $"source", $"blk")
        .agg(count(lit(1)).as("n"),
          array_join(
            expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
            " ").as("content"))
        .filter($"n" === 3)
      val perContent = blocks.groupBy($"source", $"content")
        .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      val flagged = perContent.filter($"n_docs" >= 2)
      val tops = flagged.withColumn("rn", row_number().over(
          Window.partitionBy($"source")
            .orderBy(desc("n_docs"), desc("n_occ"), $"content")))
        .filter($"rn" === 1).select($"source", $"content".as("top_block"))
      val boil = flagged.groupBy($"source")
        .agg(count(lit(1)).as("n_boiler_distinct"), sum($"n_occ").as("boiler_occ"))
      blocks.groupBy($"source").agg(count(lit(1)).as("n_blocks"))
        .join(boil, Seq("source"), "left")
        .join(tops, Seq("source"), "left")
        .select($"source", $"n_blocks",
          coalesce($"n_boiler_distinct", lit(0L)).as("n_boiler_distinct"),
          coalesce($"boiler_occ", lit(0L)).as("boiler_occ"),
          expr("1000000 * coalesce(boiler_occ, 0) div n_blocks")
            .as("boiler_share_micro"),
          coalesce($"top_block", lit("")).as("top_block"))
        .orderBy($"source")
    }, Some(s"""
      WITH base AS (SELECT doc_id, source, string_split($normSql, ' ') AS a
        FROM documents),
      toks AS (SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS pos, a[i] AS tok,
          (i - 1) // 3 AS blk
        FROM base, unnest(range(1, len(a) + 1)) AS t(i) WHERE len(a[i]) > 0),
      blocks AS (SELECT doc_id, source, blk, CAST(count(*) AS BIGINT) AS n,
          string_agg(tok, ' ' ORDER BY pos) AS content
        FROM toks GROUP BY 1, 2, 3 HAVING count(*) = 3),
      pc AS (SELECT source, content,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_occ
        FROM blocks GROUP BY 1, 2),
      flagged AS (SELECT * FROM pc WHERE n_docs >= 2),
      tops AS (SELECT source, content AS top_block FROM (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY n_docs DESC, n_occ DESC, content) AS rn FROM flagged)
        WHERE rn = 1),
      boil AS (SELECT source, CAST(count(*) AS BIGINT) AS n_boiler_distinct,
          CAST(sum(n_occ) AS BIGINT) AS boiler_occ FROM flagged GROUP BY 1),
      tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_blocks
        FROM blocks GROUP BY 1)
      SELECT t.source, t.n_blocks,
        coalesce(b.n_boiler_distinct, 0) AS n_boiler_distinct,
        coalesce(b.boiler_occ, 0) AS boiler_occ,
        1000000 * coalesce(b.boiler_occ, 0) // t.n_blocks AS boiler_share_micro,
        coalesce(p.top_block, '') AS top_block
      FROM tot t LEFT JOIN boil b ON t.source = b.source
      LEFT JOIN tops p ON t.source = p.source
      ORDER BY t.source""")),

    // ----- capped water-filling token-budget allocation -------------------
    // The budget allocator behind "sample 50% of the corpus with
    // temperature 0.5, but never more than a source has": allocate
    // a_s = min(avail_s, λ·w_s) with w_s = √avail_s (temperature-0.5
    // weights) and λ chosen so Σ a_s equals the budget — water-filling,
    // solved in CLOSED FORM, no iteration: sort sources by saturation
    // level avail/w, prefix sums give every candidate λ, and exactly one
    // rank satisfies r_{k-1} ≤ λ_k ≤ r_k. The corpus-sized work is one
    // token-count aggregate; the solver runs on the |sources| grid
    // (single-partition window, 20 rows at any SF — at 100 TB sources
    // are a catalog, not data). Validity gates and allocations use
    // 128-bit cross-products so corpus-scale token counts can't wrap;
    // the sort key is an IEEE double ratio of exactly-representable
    // longs — correctly rounded, so bit-identical on both engines.
    ("q250_waterfill_budget", (s: SparkSession, dir: String) => {
      import s.implicits._
      val avail = Tables.spread(Tables.t(s, dir, "documents"))
        .select($"source", TA.normText($"text").as("nt"))
        .select($"source",
          when($"nt" === "", lit(0L))
            .otherwise(size(split($"nt", " ")).cast("long")).as("len"))
        .groupBy($"source").agg(sum($"len").as("avail"))
        .withColumn("w",
          floor(sqrt($"avail".cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
      val tot = avail.agg(sum($"avail").as("ta"), sum($"w").as("tw"))
      val g = avail.crossJoin(broadcast(tot))
        .withColumn("r", $"avail".cast("double") / $"w".cast("double"))
      val ord = Window.orderBy($"r", $"source")
      val ranked = g
        .withColumn("k", row_number().over(ord).cast("long"))
        .withColumn("prevcum", coalesce(
          sum($"avail").over(ord.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("prevsw", $"tw" - coalesce(
          sum($"w").over(ord.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("lagavail", lag($"avail", 1).over(ord))
        .withColumn("lagw", lag($"w", 1).over(ord))
        .withColumn("lnum", expr("ta div 2") - $"prevcum")
        .withColumn("valid",
          expr("CAST(lnum AS DECIMAL(38,0)) * w <= CAST(avail AS DECIMAL(38,0)) * prevsw") &&
          ($"k" === 1L ||
            expr("CAST(lagavail AS DECIMAL(38,0)) * prevsw <= CAST(lnum AS DECIMAL(38,0)) * lagw")))
        .localCheckpoint() // solver grid reused by the pick join
      val pick = ranked.filter($"valid").orderBy($"k").limit(1)
        .select($"k".as("kstar"), $"lnum".as("plnum"), $"prevsw".as("plden"))
      ranked.crossJoin(broadcast(pick))
        .select($"source", $"avail", $"w".as("w_micro"),
          when($"k" < $"kstar", lit(1L)).otherwise(lit(0L)).as("saturated"),
          when($"k" < $"kstar", $"avail")
            .otherwise(expr("CAST(CAST(plnum AS DECIMAL(38,0)) * w div plden AS BIGINT)"))
            .as("alloc_tokens"))
        .orderBy($"source")
    }, Some(s"""
      WITH lens AS (SELECT source,
          CASE WHEN $normSql = '' THEN 0
            ELSE CAST(len(string_split($normSql, ' ')) AS BIGINT) END AS len
        FROM documents),
      av AS (SELECT source, CAST(sum(len) AS BIGINT) AS avail
        FROM lens GROUP BY 1),
      aw AS (SELECT source, avail,
          CAST(floor(sqrt(CAST(avail AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS w
        FROM av),
      tot AS (SELECT CAST(sum(avail) AS BIGINT) AS ta,
          CAST(sum(w) AS BIGINT) AS tw FROM aw),
      g AS (SELECT a.*, t.ta, t.tw,
          CAST(a.avail AS DOUBLE) / CAST(a.w AS DOUBLE) AS r
        FROM aw a CROSS JOIN tot t),
      rk AS (SELECT *,
          CAST(row_number() OVER (ORDER BY r, source) AS BIGINT) AS k,
          coalesce(sum(avail) OVER (ORDER BY r, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevcum,
          tw - coalesce(sum(w) OVER (ORDER BY r, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevsw,
          lag(avail) OVER (ORDER BY r, source) AS lagavail,
          lag(w) OVER (ORDER BY r, source) AS lagw
        FROM g),
      v AS (SELECT *, ta // 2 - prevcum AS lnum,
          (CAST(ta // 2 - prevcum AS HUGEINT) * w <= CAST(avail AS HUGEINT) * prevsw
           AND (k = 1 OR CAST(lagavail AS HUGEINT) * prevsw
                <= CAST(ta // 2 - prevcum AS HUGEINT) * lagw)) AS valid
        FROM rk),
      p AS (SELECT k AS kstar, lnum AS plnum, prevsw AS plden
        FROM v WHERE valid ORDER BY k LIMIT 1)
      SELECT source, avail, w AS w_micro,
        CAST(CASE WHEN k < kstar THEN 1 ELSE 0 END AS BIGINT) AS saturated,
        CASE WHEN k < kstar THEN avail
          ELSE CAST(CAST(plnum AS HUGEINT) * w // plden AS BIGINT) END
          AS alloc_tokens
      FROM v CROSS JOIN p ORDER BY source"""))
  )
}
