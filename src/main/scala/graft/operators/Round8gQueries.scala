package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 7: the multimodal selection stage (keyframe/shot
  * detection over the decoded frame stream) and the l-diversity
  * companion to the q206 k-anonymity audit.
  */
object Round8gQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- keyframe selection (shot detection over decoded frames) --------
    // The video-curation stage after decode: most frames are
    // near-duplicates of their predecessor, so training pipelines keep
    // only SHOT BOUNDARIES — frames whose signal jumps against the
    // previous frame — plus the first frame per clip. Frames come from
    // the q69 mapPartitions decode (stride 1 here: selection wants the
    // full stream); the boundary rule is a per-clip lag window on the
    // frame signal (|Δwidth| ≥ 16 over the stub's header-byte geometry —
    // a codec build substitutes a perceptual-hash delta with the
    // IDENTICAL dataflow). Per-clip output: frame and keyframe counts,
    // an index-sum membership pin, and the first/last boundary. Frames
    // shuffle once on doc_id for the window (bounded per clip); the
    // selection itself never leaves the clip's partition. Same
    // ASCII-only gate filter as q69 — the kernel reads bytes, SQL reads
    // chars, so the oracle comparison restricts to docs where those
    // coincide (the kernel handles arbitrary payloads).
    ("q218_keyframe_selection", (s: SparkSession, dir: String) => {
      import s.implicits._
      val media = graft.ext.Multimodal.toMediaDocs(
        Tables.spread(Tables.t(s, dir, "documents"))
          .filter($"doc_id" < 200 && octet_length($"text") === length($"text")),
        "doc_id", "text")
      val frames = graft.ext.Multimodal.extractFeatures(media, frameEvery = 1)
        .toDF()
        .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
          $"width".cast("long").as("width"))
      val w = Window.partitionBy($"doc_id").orderBy($"frame_idx")
      val kf = frames
        .withColumn("prev_w", lag($"width", 1).over(w))
        .withColumn("is_kf",
          when($"prev_w".isNull || abs($"width" - $"prev_w") >= 16, 1L).otherwise(0L))
      kf.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_frames"),
          sum($"is_kf").as("n_keyframes"),
          sum(when($"is_kf" === 1, $"frame_idx").otherwise(0L)).as("kf_idxsum"),
          min(when($"is_kf" === 1, $"frame_idx")).as("first_kf"),
          max(when($"is_kf" === 1, $"frame_idx")).as("last_kf"))
        .orderBy("doc_id")
    }, Some("""
      WITH d AS (SELECT doc_id, text,
          greatest(1, CAST(ceil(length(text)/64.0) AS BIGINT)) AS chunks
        FROM documents
        WHERE doc_id < 200 AND octet_length(encode(text)) = length(text)),
      idx AS (SELECT doc_id, text, unnest(range(0, chunks)) AS frame_idx FROM d),
      f AS (SELECT doc_id, frame_idx,
          32 + (CASE WHEN frame_idx*64 < length(text)
                THEN ascii(substr(text, CAST(frame_idx*64+1 AS INT), 1)) ELSE 0 END) % 64 AS width
        FROM idx),
      kf AS (SELECT doc_id, frame_idx, width,
          lag(width, 1) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_w
        FROM f),
      k2 AS (SELECT doc_id, frame_idx,
          CASE WHEN prev_w IS NULL OR abs(width - prev_w) >= 16 THEN 1 ELSE 0 END AS is_kf
        FROM kf)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        CAST(sum(is_kf) AS BIGINT) AS n_keyframes,
        CAST(sum(CASE WHEN is_kf = 1 THEN frame_idx ELSE 0 END) AS BIGINT) AS kf_idxsum,
        min(CASE WHEN is_kf = 1 THEN frame_idx END) AS first_kf,
        max(CASE WHEN is_kf = 1 THEN frame_idx END) AS last_kf
      FROM k2 GROUP BY doc_id ORDER BY doc_id""")),

    // ----- l-diversity audit (the k-anonymity companion) ------------------
    // k-anonymity (q206) bounds group SIZE; l-diversity bounds what a
    // linker LEARNS: a group whose members all share one sensitive value
    // leaks it regardless of size. Quasi-identifiers here are (nation,
    // balance band); the sensitive attribute is the market segment; a
    // group's diversity is its distinct sensitive-value count. Same
    // histogram discipline as q206: one distinct-count aggregate to
    // groups, then the l sweep in {2, 3, 4, 5} runs over the
    // (diversity → group count/row count) histogram, never rescanning
    // rows. `n_rows_exposed` at l=2 counts members of single-segment
    // groups — the rows whose segment the release hands to any linker.
    ("q219_l_diversity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val qi = Tables.t(s, dir, "customer")
        .select($"c_nationkey", floor($"c_acctbal" / 1000).cast("long").as("bal_b"),
          $"c_mktsegment")
      val gs = qi.groupBy($"c_nationkey", $"bal_b")
        .agg(count(lit(1)).as("g"), countDistinct($"c_mktsegment").as("ldiv"))
      val hist = gs.groupBy($"ldiv")
        .agg(count(lit(1)).as("n_groups"), sum($"g").as("n_rows"))
      val tot = hist.agg(sum($"n_rows").as("t_rows"))
      hist.select(explode(array(Seq(2L, 3L, 4L, 5L).map(lit): _*)).as("l"),
          $"ldiv", $"n_groups", $"n_rows")
        .groupBy($"l")
        .agg(sum(when($"ldiv" < $"l", $"n_groups").otherwise(0L)).as("n_groups_below"),
          sum(when($"ldiv" < $"l", $"n_rows").otherwise(0L)).as("n_rows_exposed"))
        .crossJoin(broadcast(tot))
        .select($"l", $"n_groups_below", $"n_rows_exposed",
          expr("(1000000 * n_rows_exposed) div t_rows").as("exposed_micro"))
        .orderBy("l")
    }, Some("""
      WITH qi AS (SELECT c_nationkey,
          CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_b, c_mktsegment
        FROM customer),
      gs AS (SELECT CAST(count(*) AS BIGINT) AS g,
          CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS ldiv
        FROM qi GROUP BY c_nationkey, bal_b),
      hist AS (SELECT ldiv, CAST(count(*) AS BIGINT) AS n_groups,
          CAST(sum(g) AS BIGINT) AS n_rows FROM gs GROUP BY ldiv),
      tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t_rows FROM hist),
      l AS (SELECT unnest([2, 3, 4, 5]) AS l)
      SELECT CAST(l.l AS BIGINT) AS l,
        CAST(sum(CASE WHEN h.ldiv < l.l THEN h.n_groups ELSE 0 END) AS BIGINT) AS n_groups_below,
        CAST(sum(CASE WHEN h.ldiv < l.l THEN h.n_rows ELSE 0 END) AS BIGINT) AS n_rows_exposed,
        (1000000 * CAST(sum(CASE WHEN h.ldiv < l.l THEN h.n_rows ELSE 0 END) AS BIGINT)) // t.t_rows AS exposed_micro
      FROM hist h CROSS JOIN l CROSS JOIN tot t
      GROUP BY l.l, t.t_rows ORDER BY l"""))
  )
}
