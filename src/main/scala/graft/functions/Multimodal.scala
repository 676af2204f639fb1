package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus a partition-parallel feature-extract
  * operator.
  *
  * The real decode step (image/audio libs) is STUBBED — this container has
  * no codec libraries — with a deterministic fake that derives "features"
  * from the raw bytes. Everything Spark-side is real and tested: schema,
  * binary column plumbing, partitioning, batch iteration shape. Swapping
  * [[FakeCodec.decode]] for a JNI/javacv call is the only change needed for
  * real media.
  */
object Multimodal {

  /** A media row: payload + typed metadata (the schema a 100 TB multimodal
    * lake would carry; payload stays opaque until feature-extract time). */
  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int,
                      media_type: String)

  case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte: Double,
                           first_byte: Int, width: Int, height: Int)

  /** STUB codec — deterministic fakes: byte statistics stand in for decoded
    * pixel features, truncation for resize, strided chunks for frame
    * sampling. Real implementations would decode `payload` (JPEG/PNG/WAV…)
    * with a native library; the Spark-side plumbing (schemas, partitioning,
    * batch iteration) is identical either way. */
  object FakeCodec {
    def decode(m: MediaRow): MediaFeatures = {
      val n = m.payload.length
      val mean = if (n == 0) 0.0 else m.payload.map(b => (b & 0xff).toDouble).sum / n
      MediaFeatures(m.doc_id, n, math.round(mean * 10000).toDouble / 10000,
        if (n == 0) -1 else m.payload(0) & 0xff, m.width, m.height)
    }

    /** "Resize" to target dims: real codec would rescale pixels; the fake
      * scales the payload length proportionally (deterministic). */
    def resize(m: MediaRow, w: Int, h: Int): MediaRow = {
      val scale = (w.toLong * h).toDouble / math.max(1L, m.width.toLong * m.height)
      val newLen = math.max(0, math.min(m.payload.length, math.round(m.payload.length * scale).toInt))
      m.copy(payload = m.payload.take(newLen), width = w, height = h)
    }

    /** "Frame-sample": every `stride`-th fixed-size chunk of the payload
      * (a video codec would seek to keyframes; the plumbing — one row in,
      * many frame rows out — is the real part). */
    def sampleFrames(m: MediaRow, frameBytes: Int, stride: Int): Seq[(Int, Array[Byte])] =
      m.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => (i, chunk) }.toSeq
  }

  case class Frame(doc_id: Long, frame_no: Int, frame_bytes: Int)

  /** Frame sampling as a flatMap over the typed dataset — one media row in,
    * N frame rows out, fully partition-parallel. */
  def sampleFrames(s: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import s.implicits._
    media.as[MediaRow].flatMap { m =>
      FakeCodec.sampleFrames(m, frameBytes, stride).map { case (i, chunk) =>
        Frame(m.doc_id, i, chunk.length)
      }
    }
  }

  /** Attach a fake binary payload + metadata to the documents table (the
    * test corpus has no real media; text bytes stand in for the blob). */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      ((col("n_chars") % 640) + 16).cast("int").as("width"),
      (((col("doc_id") * 37) % 480) + 16).cast("int").as("height"),
      when(col("doc_id") % 3 === 0, "image/png").otherwise("image/jpeg").as("media_type"))

  /** Metadata projection — oracle-checkable (octet_length of the payload and
    * the derived dimensions). */
  def x11MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    withMediaColumns(documents(s, dir))
      .select(col("doc_id"), octet_length(col("payload")).as("payload_bytes"),
        col("width"), col("height"), col("media_type"))
      .orderBy(col("doc_id"))

  /** Partition-parallel feature extraction: mapPartitions over the typed
    * Dataset — one codec instance per partition, no driver involvement, the
    * Scala analogue of mapInPandas batch processing. */
  def extractFeatures(s: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import s.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition codec init would go here (real decoder handle)
      it.map(FakeCodec.decode)
    }
  }

  /** Feature-extract as a declared query — the deterministic fake codec's
    * arithmetic is recomputed in SQL (SparkEntry's x12 oracle), so even
    * the mapPartitions path is hash-verified. */
  def x12MultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(s, withMediaColumns(documents(s, dir))).toDF()
      .orderBy(col("doc_id"))

  /** Frame sampling as pure column ops — the same chunk arithmetic as
    * [[FakeCodec.sampleFrames]] (every `stride`-th `frameBytes`-size chunk,
    * last chunk truncated) expressed with `sequence`+`explode`, so the
    * fan-out stays inside whole-stage codegen. The typed flatMap form
    * ([[sampleFrames]]) is kept as the codec-boundary model a real decoder
    * slots into; FunctionsSpec pins the two forms row-identical. */
  def sampleFramesCols(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = ceil(col("n") / lit(frameBytes.toDouble)).cast("int")
    media
      .select(col("doc_id"), octet_length(col("payload")).as("n"))
      .select(col("doc_id"), col("n"),
        // sequence's step argument materializes only the kept frame indexes
        // (ceil(nFrames/stride) entries) instead of building the full index
        // array and filtering it stride-times smaller afterwards
        explode(when(nFrames >= 1, sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(typedlit(Seq.empty[Int]))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        least(lit(frameBytes), col("n") - col("frame_no") * frameBytes).cast("int").as("frame_bytes"))
  }

  /** Frame sampling as a declared query: every 4th 64-byte chunk per
    * payload — one row in, N frame rows out, via the codegen'd column form.
    * The chunk arithmetic is pure byte math, so DuckDB reproduces it
    * exactly from octet_length. */
  def x17FrameSample(s: SparkSession, dir: String): DataFrame =
    sampleFramesCols(withMediaColumns(documents(s, dir)))
      .orderBy(col("doc_id"), col("frame_no"))

  /** Resize-to-32×32 as a declared query (metadata view of the resized
    * payload): the fake codec scales payload length by the pixel ratio —
    * again pure arithmetic, mirrored term-for-term in the oracle. */
  def x18ResizeMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withMediaColumns(documents(s, dir)).as[MediaRow]
      .map { m =>
        val r = FakeCodec.resize(m, 32, 32)
        (r.doc_id, r.payload.length, r.width, r.height)
      }
      .toDF("doc_id", "new_len", "width", "height")
      .orderBy(col("doc_id"))
  }
}
