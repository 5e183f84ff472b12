package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev harness (not part of the engine surface): attribute
  * q_stream_dedup's second-decade cost (r14 soak: exp 1.23 solo at
  * sf1→sf10). Times, per corpus dir:
  *   1. batch distinct over the same key triple (data-path floor)
  *   2. the same watermarked dropDuplicatesWithinWatermark stream to a
  *      NOOP sink (stream + state-store cost, no driver collection)
  *   3. the registered shape: memory sink + count (adds the
  *      driver-side collected output)
  * `runMain graft.tools.ProfileStreamDedup <dir> [<dir> ...]`
  */
object ProfileStreamDedup {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    args.foreach { dir =>
      println(s"[profile] === $dir ===")
      val ev = graft.Tables.events(spark, dir)
        .select(col("ts"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("value_cents"))
      t("batch distinct") {
        ev.dropDuplicates("user_id", "event_type", "value_cents").count()
      }
      val span = {
        val b = graft.Tables.events(spark, dir)
          .agg(min(col("ts")), max(col("ts"))).head()
        java.time.Duration.between(
          b.getTimestamp(0).toInstant, b.getTimestamp(1).toInstant)
          .toDays + 2
      }
      def stream() = {
        val schema = spark.read.parquet(s"$dir/events.parquet").schema
        val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val raw =
          if (fs.getFileStatus(p).isDirectory)
            spark.readStream.schema(schema).parquet(p.toString)
          else spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir)
        val tsed = schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
        }
        tsed.select(col("ts"), col("user_id"), col("event_type"),
            round(col("value") * 100).cast("long").as("value_cents"))
          .withWatermark("ts", s"$span days")
          .dropDuplicatesWithinWatermark("user_id", "event_type", "value_cents")
          .select("user_id", "event_type", "value_cents")
      }
      t("stream -> noop") {
        val q = stream().writeStream.outputMode(OutputMode.Append)
          .format("noop")
          .option("checkpointLocation",
            s"/tmp/psd-noop-${java.util.UUID.randomUUID()}")
          .start()
        q.processAllAvailable(); q.stop()
      }
      t("stream -> memory + count") {
        val name = "psd_mem_" + math.abs(dir.hashCode)
        val q = stream().writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName(name)
          .option("checkpointLocation",
            s"/tmp/psd-mem-${java.util.UUID.randomUUID()}")
          .start()
        q.processAllAvailable()
        println(s"[profile]   rows=${spark.table(name).count()}")
        q.stop()
      }
    }
    spark.stop()
  }
}
