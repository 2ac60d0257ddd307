package graft.streaming

import java.sql.Timestamp

import graft.core.TagAttributes
import graft.pipeline.{ExtractJob, TranscriptGen, Turn}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming path equality: the stream must produce exactly the batch
  * results per turn; stateful conversation tracking must accumulate across
  * micro-batches.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def turnsData(from: Long, until: Long): Seq[Turn] =
    (from until until).map(g => TranscriptGen.turnAt(g, 42))

  test("streaming extraction equals batch extraction per turn") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingExtract.extractStream(input.toDS())
      .writeStream.format("memory").queryName("stream_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(turnsData(0, 300): _*)
    q.processAllAvailable()
    input.addData(turnsData(300, 600): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_out")
      .select("conv_id", "turn_idx", "plain_text", "html").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getString(2), r.getString(3)))).toMap
    assert(streamed.size == 600)
    turnsData(0, 600).foreach { t =>
      val e = ExtractJob.extractTurn(t, TagAttributes.bbcodeCanonical)
      assert(streamed((t.conv_id, t.turn_idx)) == ((e.plain_text, e.html)), s"${t.conv_id}/${t.turn_idx}")
    }
  }

  test("stateful conversation tracking accumulates across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingExtract.conversationState(input.toDS())
      .writeStream.format("memory").queryName("conv_state")
      .outputMode(OutputMode.Update()).start()

    val conv = "convA"
    def t(i: Int, text: String) = Turn(conv, i, "user", text, "", new Timestamp(1700000000000L + i))
    input.addData(t(0, "ab"), t(1, "cde"))
    q.processAllAvailable()
    input.addData(t(2, "f"))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("conv_state").collect()
      .filter(_.getString(0) == conv)
      .maxBy(_.getLong(1))
    assert(last.getLong(1) == 3L)    // turns
    assert(last.getLong(2) == 6L)    // chars 2+3+1
    assert(last.getInt(3) == 2)      // last idx
  }

  test("watermarked windowed aggregation produces per-conversation counts") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingExtract.windowedConvStats(input.toDS(), "1 minute", "1 minute")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update()).start()

    input.addData(turnsData(0, 100): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_turns")).sum == 100L)
  }
}
