package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-based CSV extractor path (reference examples/02_csv_to_hdf5.py
  * shape): wide CSV on disk -> long samples, including via the Registry.
  */
class CsvTelemetrySourceSpec extends SparkSpec {

  private def writeCsv(): String = {
    val dir = java.nio.file.Files.createTempDirectory("csvsrc")
    val f = dir.resolve("telemetry.csv")
    val rows = Seq("time,apid,seq_count,star_tracker_temp,reaction_wheel_rpm") ++
      (0 until 50).map { i =>
        val temp = if (i % 10 == 0) "" else (2200 + 100 * math.sin(i / 30.0)).toString
        s"$i.0,768,$i,$temp,${5000 + 200 * math.cos(i / 20.0)}"
      }
    java.nio.file.Files.write(f, String.join("\n", rows: _*).getBytes("UTF-8"))
    f.toString
  }

  test("readSamples: wide CSV file unpivots to long samples, NaN cells dropped") {
    val samples = CsvTelemetrySource.readSamples(spark, writeCsv())
    // 50 rows x 2 params, minus 5 empty star_tracker_temp cells
    assert(samples.count() == 95)
    assert(samples.where(col("name") === "star_tracker_temp").count() == 45)
    val r = samples.where(col("name") === "reaction_wheel_rpm" && col("seq_count") === 3).head()
    assert(r.getAs[Double]("raw_value") == 5000 + 200 * math.cos(3 / 20.0))
    assert(r.getAs[Double]("eng_value") == r.getAs[Double]("raw_value")) // identity pre-calibration
    assert(r.getAs[Int]("apid") == 768)
    assert(r.getAs[Double]("time_tai") == 3.0)
  }

  test("missing required columns fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("csvbad")
    val f = dir.resolve("bad.csv")
    java.nio.file.Files.write(f, "time,value\n1.0,2.0\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      CsvTelemetrySource.readSamples(spark, f.toString)
    }
    assert(e.getMessage.contains("apid"))
  }

  test("registry csv extractor + calibration end-to-end") {
    val path = writeCsv()
    val extract = graft.Registry.getExtractor("csv")
    val samples = extract(spark, graft.Registry.parseConfig(s"""{"path": "$path"}"""))
    val cal = graft.Registry.getTransformer("calibration")(graft.Registry.parseConfig(
      """{"calibrations": [{"parameter_name": "star_tracker_temp",
        |  "method": "polynomial", "unit": "degC",
        |  "coefficients": [-273.15, 0.1]}]}""".stripMargin))
    val out = cal(samples).where(col("name") === "star_tracker_temp" && col("seq_count") === 1)
      .head()
    val raw = 2200 + 100 * math.sin(1 / 30.0)
    assert(math.abs(out.getAs[Double]("eng_value") - (-273.15 + 0.1 * raw)) < 1e-9)
    assert(out.getAs[String]("unit") == "degC")
  }
}
