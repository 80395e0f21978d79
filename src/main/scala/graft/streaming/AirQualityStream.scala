package graft.streaming

import graft.pipeline.AirQuality
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming form of the bronze→silver hop (SURVEY §2.8): the
  * reference's batch re-pull + first-write-wins dedup becomes a file
  * stream + watermarked keyed dedup.
  *
  * Semantics mapping:
  *  - S5 CSV scan        -> `readStream.csv` with the same schema/sep;
  *  - O3 + O2            -> identical column expressions (they are
  *                          plain projections/filters, streamable);
  *  - K5 first-write-wins -> `dropDuplicatesWithinWatermark` on
  *                          (code_site, date_de_debut): the first row
  *                          to arrive wins, later duplicates are
  *                          dropped while their key is inside the
  *                          watermark horizon. The reference's "re-pull
  *                          the last 3 days" reprocessing window maps
  *                          to a 3-day watermark — late data beyond it
  *                          is expired state, exactly like the
  *                          reference's daily horizon.
  */
object AirQualityStream {

  def silverStream(spark: SparkSession, dir: String,
      watermark: String = "3 days"): DataFrame = {
    val bronze = spark.readStream
      .option("sep", ";")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(AirQuality.bronzeSchema)
      .csv(dir)
    AirQuality.castSilver(AirQuality.filterEmptyRows(bronze))
      .withWatermark("date_de_debut", watermark)
      .dropDuplicatesWithinWatermark("code_site", "date_de_debut")
  }
}
