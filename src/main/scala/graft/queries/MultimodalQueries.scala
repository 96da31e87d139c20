package graft.queries

import graft.{GQuery, Tables}
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal pipeline queries. q51 verifies the mapPartitions/flatMap
  * plumbing end-to-end: the DuckDB oracle recomputes the frame
  * inventory (counts + byte sizes) from the same integer arithmetic
  * the codec stub uses, so a drift in partition handling, slicing, or
  * fan-out breaks the hash match. q52 is the non-SQL-expressible
  * feature-extraction surface (driver records a rows-only check).
  */
object MultimodalQueries {
  import Tables.t

  def all: Seq[GQuery] = Seq(

    GQuery(
      "q51_media_frame_inventory",
      (s, dir) => {
        import s.implicits._
        val media = MultimodalOps.mediaFromDocuments(t(s, dir, "documents"))
        MultimodalOps.sampleFrames(media)
          .groupBy($"kind")
          .agg(count(lit(1)).as("n_frames"),
            sum(octet_length($"frame")).as("total_bytes"))
      },
      Some("""WITH m AS (SELECT doc_id,
             |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             |    CAST(strlen(text) AS BIGINT) AS nbytes,
             |    CAST(doc_id % 8 AS INT) + 1 AS nf
             |  FROM documents),
             |fr AS (SELECT kind, nbytes,
             |    CASE WHEN kind = 'video' THEN nf ELSE 1 END AS nsl,
             |    unnest(generate_series(0, CASE WHEN kind = 'video' THEN nf ELSE 1 END - 1)) AS i
             |  FROM m),
             |sz AS (SELECT kind, nbytes,
             |    greatest(nbytes // nsl, 1) AS len,
             |    least(i * greatest(nbytes // nsl, 1), greatest(nbytes - 1, 0)) AS lo
             |  FROM fr)
             |SELECT kind, count(*) AS n_frames,
             |  CAST(sum(least(lo + len, nbytes) - lo) AS BIGINT) AS total_bytes
             |FROM sz GROUP BY kind""".stripMargin)),

    // feature extraction through the codec stub, verified end-to-end:
    // the first/last chunk byte-sums are reconstructed from the float
    // features (exact: sum = round(feature * chunk_len * 256), and both
    // factors fit the float32 mantissa for <16 MB payloads), so the
    // oracle recomputes them with pure integer arithmetic in DuckDB.
    // Output is all-scalar — the driver's pandas harness cannot sort
    // array columns.
    GQuery(
      "q52_media_features",
      (s, dir) => {
        import s.implicits._
        val media = MultimodalOps.mediaFromDocuments(t(s, dir, "documents"))
        val feats = MultimodalOps.extractFeatures(media, dim = 16)
        val n = $"n_bytes"
        // chunk bounds as the codec computes them: lo_i = floor(n*i/16),
        // hi_i = max(floor(n*(i+1)/16), lo_i+1), len_i = min(hi_i, n) - lo_i
        val cntFirst = least(greatest(floor(n / 16).cast("long"), lit(1L)), n)
        val loLast = floor(n * 15 / 16).cast("long")
        val cntLast = n - loLast
        feats.select(
          $"media_id", $"kind",
          size($"features").as("dim"),
          n,
          round(element_at($"features", 1).cast("double") * cntFirst * 256)
            .cast("long").as("s_first"),
          round(element_at($"features", 16).cast("double") * cntLast * 256)
            .cast("long").as("s_last"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id,
             |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             |    text, CAST(strlen(text) AS BIGINT) AS n
             |  FROM documents)
             |SELECT media_id, kind, 16 AS dim, n AS n_bytes,
             |  CAST(coalesce(list_sum(list_transform(
             |    range(1, CAST(least(greatest(n // 16, 1), n) AS BIGINT) + 1),
             |    j -> ord(substr(text, CAST(j AS INT), 1)))), 0) AS BIGINT) AS s_first,
             |  CAST(coalesce(list_sum(list_transform(
             |    range(CAST(n * 15 // 16 AS BIGINT) + 1, n + 1),
             |    j -> ord(substr(text, CAST(j AS INT), 1)))), 0) AS BIGINT) AS s_last
             |FROM m""".stripMargin))
  )
}
