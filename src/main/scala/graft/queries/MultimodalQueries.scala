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

    // feature extraction through the codec stub — not SQL-expressible;
    // registered for the driver's rows-only check
    GQuery(
      "q52_media_features",
      (s, dir) => {
        val media = MultimodalOps.mediaFromDocuments(t(s, dir, "documents"))
        MultimodalOps.extractFeatures(media, dim = 16)
      },
      None)
  )
}
