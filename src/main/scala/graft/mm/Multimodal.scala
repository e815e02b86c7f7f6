package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (LLM-pipeline brief): media payloads are
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The container has no image/audio codecs, so [[stubDecode]] is a
  * clearly-marked deterministic fake; the Spark-side plumbing — binary
  * schema, batched per-partition processing, typed output — is real and
  * is what a codec would plug into.
  */
object Multimodal {

  /** Wrap a text column as a binary payload with extracted metadata
    * (byte length + leading-bytes "magic" hex), the shape a real
    * media-ingest table would have.
    */
  def asBinary(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(payloadCol), "UTF-8").as("payload"),
      struct(
        // length() on a binary column counts bytes (octet_length is
        // SQL-only, absent from the Scala functions API)
        length(encode(col(payloadCol), "UTF-8")).as("n_bytes"),
        substring(hex(encode(col(payloadCol), "UTF-8")), 1, 8).as("magic")).as("meta"))

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB decoder — stands in for image/audio decode + feature
    * extraction (the real codec libraries are absent in this
    * container). Deterministic fake: 8 "features" from the leading
    * payload bytes. Runs via `mapPartitions` over batches, which is the
    * exact call shape a vectorized decode (e.g. Pandas-UDF-style) slots
    * into.
    */
  // ------------------------------------------------------------------ //
  // Real narrow decode: PNG IHDR / JPEG SOF0 header fields.             //
  // No codec library involved — container-format headers are plain      //
  // big-endian byte layouts, so width/height/depth are parseable with   //
  // pure byte ops. This replaces the stub for the metadata slice of     //
  // decode; pixel decode stays behind the stub plug point.              //
  // ------------------------------------------------------------------ //

  /** Synthesize a valid media header per document — PNG for even ids,
    * JPEG for odd — with dimensions derived from the id. Built from
    * Spark expressions (unhex/concat) so synthesis itself is a
    * codegen'd row-local map. The JPEG variant carries a COM segment
    * of id-varying length before SOF0, so decoding it requires a real
    * marker walk, not a fixed offset.
    */
  def synthesizeMedia(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def be(v: Column, nBytes: Int): Column = unhex(lpad(hex(v), nBytes * 2, "0"))
    val w = id % 1024 + 1
    val h = (id * 7) % 1024 + 1
    // PNG: signature + IHDR(len=13) + w(4) + h(4) + depth(1) +
    // colorType(1) + comp/filter/interlace(3) + CRC(4; zeroed — the
    // header parse doesn't checksum)
    val colorType = element_at(array(lit("00"), lit("02"), lit("06")), (id % 3 + 1).cast("int"))
    val png = concat(
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be(w, 4), be(h, 4),
      unhex(lit("08")), unhex(colorType), unhex(lit("000000")), unhex(lit("00000000")))
    // JPEG: SOI + 16-byte JFIF APP0 + COM with (id%8)+1 padding bytes
    // + SOF0 (8-bit precision, 3 components)
    val jw = id % 500 + 16
    val jh = (id * 3) % 500 + 16
    val pad = (id % 8 + 1).cast("int")
    val jpeg = concat(
      unhex(lit("FFD8")),
      unhex(lit("FFE00010" + "4A46494600" + "0101" + "00" + "0048" + "0048" + "0000")),
      unhex(lit("FFFE")), be(pad + 2, 2), unhex(lit("41" * 8).substr(lit(1), pad * 2)),
      unhex(lit("FFC00011" + "08")), be(jh, 2), be(jw, 2),
      unhex(lit("03" + "012200" + "021101" + "031101")))
    docs.select(id, when(id % 2 === 0, png).otherwise(jpeg).as("payload"))
  }

  /** Synthesize a valid WAV (RIFF) header per document — the audio
    * analog of [[synthesizeMedia]], LITTLE-endian where PNG/JPEG are
    * big-endian. An id-varying even-sized JUNK chunk (a standard RIFF
    * filler) sits before `fmt `, so decoding requires a real chunk
    * walk. channels/rate derive from the id.
    */
  def synthesizeWav(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def le(v: Column, nBytes: Int): Column = concat((0 until nBytes).map { i =>
      unhex(lpad(hex(shiftright(v.cast("long"), 8 * i).bitwiseAND(255)), 2, "0"))
    }: _*)
    val channels = (id % 2 + 1).cast("int")
    val rate = (lit(8000) + (id % 8).cast("int") * 4000).cast("int")
    val bits = lit(16)
    val pad = ((id % 4) * 2 + 2).cast("int") // even: RIFF chunks are word-aligned
    val riffSize = pad + 36 // "WAVE" + JUNK hdr + pad + fmt hdr + 16
    val payload = concat(
      unhex(lit("52494646")), le(riffSize, 4), unhex(lit("57415645")), // RIFF <size> WAVE
      unhex(lit("4A554E4B")), le(pad, 4), unhex(lit("00" * 8).substr(lit(1), pad * 2)), // JUNK
      unhex(lit("666D7420")), le(lit(16), 4), // "fmt " 16
      le(lit(1), 2), le(channels, 2), le(rate, 4),
      le(rate * channels * bits / 8, 4), le(channels * bits / 8, 2), le(bits, 2))
    docs.select(id, payload.as("payload"))
  }

  /** [[synthesizeWav]] with a real PCM `data` chunk appended — the
    * payload audio chunking actually reads. Frame count and the PCM
    * fill are id-derived: nFrames = id%7+5, byte j (0-based within
    * data) = (id·17+j)%256; block align stays channels·2 (16-bit),
    * so chunk boundaries are SAMPLE-accurate, never mid-frame.
    */
  def synthesizeWavPcm(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def le(v: Column, nBytes: Int): Column = concat((0 until nBytes).map { i =>
      unhex(lpad(hex(shiftright(v.cast("long"), 8 * i).bitwiseAND(255)), 2, "0"))
    }: _*)
    val channels = (id % 2 + 1).cast("int")
    val rate = (lit(8000) + (id % 8).cast("int") * 4000).cast("int")
    val bits = lit(16)
    val ba = channels * 2
    val nFrames = (id % 7 + 5).cast("int")
    val dataLen = nFrames * ba
    val pad = ((id % 4) * 2 + 2).cast("int")
    val riffSize = lit(44) + pad + dataLen // 4 WAVE + (8+pad) + 24 + (8+dataLen)
    val pcmHex = array_join(
      transform(sequence(lit(0), dataLen - 1),
        j => lpad(hex((id * 17 + j) % 256), 2, "0")), "")
    val payload = concat(
      unhex(lit("52494646")), le(riffSize, 4), unhex(lit("57415645")),
      unhex(lit("4A554E4B")), le(pad, 4), unhex(lit("00" * 8).substr(lit(1), pad * 2)),
      unhex(lit("666D7420")), le(lit(16), 4),
      le(lit(1), 2), le(channels, 2), le(rate, 4),
      le(rate * channels * bits / 8, 4), le(ba, 2), le(bits, 2),
      unhex(lit("64617461")), le(dataLen, 4), unhex(pcmHex))
    docs.select(id, payload.as("payload"))
  }

  private val audioChunkSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("chunk_idx", LongType),
    StructField("byte_off", LongType),
    StructField("n_samples", LongType),
    StructField("byte_sum", LongType)))

  /** Sample-accurate audio chunking: RIFF walk to `fmt ` (block align)
    * and `data`, then fixed `chunkFrames`-sample segments with a
    * shorter tail — the segmentation an ASR/feature pipeline feeds its
    * (stubbed — no audio libs in the container) encoder. Offsets,
    * sample counts and byte sums are read from the BYTES; a `data`
    * chunk that is not frame-aligned or overruns the payload drops the
    * row. Row-local mapPartitions; chunks-per-payload bounds fan-out.
    */
  def chunkAudio(media: DataFrame, idCol: String, chunkFrames: Int): DataFrame = {
    require(chunkFrames >= 1, "chunkFrames must be >= 1")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioChunkSchema)
    media.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val parsed = for {
            (channels, _, bits, _) <- parseWavHeader(bytes)
            dataOff <- findRiffChunk(bytes, "data")
            // block align from the parsed fmt chunk, not an assumed
            // 16-bit width: 8/24-bit WAVs chunk on their real frame size
            if bits % 8 == 0 && bits > 0
            ba = (channels * bits / 8).toInt
            if ba > 0
            len = leAt(bytes, dataOff + 4, 4).toInt
            if len >= 0 && len % ba == 0 && dataOff + 8 + len <= bytes.length
          } yield {
            val start = dataOff + 8
            val nFrames = len / ba
            (0 until (nFrames + chunkFrames - 1) / chunkFrames).map { k =>
              val f0 = k * chunkFrames
              val nf = math.min(chunkFrames, nFrames - f0)
              val off = start + f0 * ba
              val sum = (off until off + nf * ba).map(j => (bytes(j) & 0xff).toLong).sum
              Row(id, k.toLong, off.toLong, nf.toLong, sum)
            }
          }
          parsed.toSeq.flatten
        }
      }(enc).toDF("doc_id", "chunk_idx", "byte_off", "n_samples", "byte_sum")
  }

  /** Offset of the first RIFF chunk with the given 4cc (after the
    * 12-byte RIFF/WAVE preamble); odd chunk sizes carry a pad byte.
    */
  private def findRiffChunk(bytes: Array[Byte], cc: String): Option[Int] = {
    def fourCC(off: Int): String = new String(bytes.slice(off, off + 4), "US-ASCII")
    if (bytes.length < 12 || fourCC(0) != "RIFF" || fourCC(8) != "WAVE") return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val size = leAt(bytes, off + 4, 4)
      if (fourCC(off) == cc) return Some(off)
      // a u32 size over the payload length (incl. high-bit values that
      // wrap Int negative) would stall or reverse the walk — reject the
      // payload, mirroring parseMp4Frames' size guard
      if (size < 0 || size > bytes.length) return None
      off += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  private val wavSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("bits", LongType),
    StructField("fmt_off", LongType),
    StructField("payload_hex", StringType)))

  private def leAt(bytes: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (bytes(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Parse (channels, sampleRate, bits, fmtOffset) from a RIFF/WAVE
    * header by walking chunks (4cc + little-endian u32 size, sizes
    * padded to even) until `fmt `. None for anything unparseable.
    */
  def parseWavHeader(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    def fourCC(off: Int): String = new String(bytes.slice(off, off + 4), "US-ASCII")
    if (bytes.length < 12 || fourCC(0) != "RIFF" || fourCC(8) != "WAVE") None
    else {
      var off = 12
      var res: Option[(Long, Long, Long, Long)] = None
      while (res.isEmpty && off + 8 <= bytes.length) {
        val size = leAt(bytes, off + 4, 4)
        if (fourCC(off) == "fmt " && off + 8 + 16 <= bytes.length) {
          res = Some((leAt(bytes, off + 10, 2), leAt(bytes, off + 12, 4),
            leAt(bytes, off + 22, 2), off.toLong))
        } else if (size < 0 || size > bytes.length) {
          return None // wrapped/overlong chunk size: same guard as findRiffChunk
        } else off += 8 + size.toInt + (size.toInt & 1) // odd sizes carry a pad byte
      }
      res
    }
  }

  /** [[decodeHeaders]]' audio sibling over the same mapPartitions
    * shape; unparseable payloads are dropped.
    */
  def decodeWavHeaders(media: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(wavSchema)
    media.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          parseWavHeader(bytes).map { case (ch, rate, bits, off) =>
            Row(id, ch, rate, bits, off, bytes.map(b => f"$b%02X").mkString)
          }
        }
      }(enc).toDF("doc_id", "channels", "sample_rate", "bits", "fmt_off", "payload_hex")
  }

  /** Synthesize a valid MP4 (ISO BMFF) header per document — the video
    * analog: `ftyp` + an id-varying `free` filler box + `moov`
    * containing a version-0 `mvhd` with id-derived timescale/duration.
    * Box sizes are big-endian u32; finding `mvhd` requires a NESTED
    * walk (top-level boxes, then moov's children).
    */
  def synthesizeMp4(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def be(v: Column, nBytes: Int): Column = unhex(lpad(hex(v.cast("long")), nBytes * 2, "0"))
    val pad = (id % 6 + 1).cast("int")
    val timescale = (lit(1000) + (id % 10).cast("int") * 100).cast("int")
    val duration = ((id * 997) % 100000).cast("int")
    // mvhd v0: 8-byte box header + 100 content bytes (v+flags, ctime,
    // mtime, timescale, duration, rate..next_track — tail zeroed)
    val mvhd = concat(
      be(lit(108), 4), unhex(lit("6D766864")), unhex(lit("00" * 12)),
      be(timescale, 4), be(duration, 4), unhex(lit("00" * 80)))
    val payload = concat(
      be(lit(16), 4), unhex(lit("66747970")), unhex(lit("69736F6D")), be(lit(0), 4), // ftyp isom
      be(pad + 8, 4), unhex(lit("66726565")), unhex(lit("00" * 6).substr(lit(1), pad * 2)), // free
      be(lit(116), 4), unhex(lit("6D6F6F76")), mvhd) // moov = 8 + 108
    docs.select(id, payload.as("payload"))
  }

  private val mp4Schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("mvhd_off", LongType),
    StructField("payload_hex", StringType)))

  /** Parse (timescale, duration, absolute mvhd offset) from an ISO
    * BMFF stream: verify `ftyp`, walk top-level boxes by their
    * big-endian sizes, then walk `moov`'s children to `mvhd` (v0:
    * timescale at +20, duration at +24). None if unparseable.
    */
  def parseMp4Header(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    def fourCC(off: Int): String = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
    def walk(from: Int, until: Int, target: String): Option[Int] = {
      var off = from
      var res: Option[Int] = None
      while (res.isEmpty && off + 8 <= until) {
        val size = beAt(bytes, off, 4).toInt
        if (size < 8) return None // malformed box cannot advance
        if (fourCC(off) == target) res = Some(off) else off += size
      }
      res
    }
    if (bytes.length < 16 || fourCC(0) != "ftyp") None
    else
      walk(0, bytes.length, "moov").flatMap { moov =>
        val moovEnd = math.min(moov + beAt(bytes, moov, 4).toInt, bytes.length)
        walk(moov + 8, moovEnd, "mvhd").collect {
          case m if m + 28 <= bytes.length =>
            (beAt(bytes, m + 20, 4), beAt(bytes, m + 24, 4), m.toLong)
        }
      }
  }

  /** Video sibling of [[decodeHeaders]]/[[decodeWavHeaders]]. */
  def decodeMp4Headers(media: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mp4Schema)
    media.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          parseMp4Header(bytes).map { case (ts, dur, off) =>
            Row(id, ts, dur, off, bytes.map(b => f"$b%02X").mkString)
          }
        }
      }(enc).toDF("doc_id", "timescale", "duration", "mvhd_off", "payload_hex")
  }

  /** Synthesize an MP4 whose `moov` carries a real `stsz` sample-size
    * table and whose `mdat` holds the concatenated frame bytes — the
    * structure frame sampling actually reads (simplification vs a full
    * container: `stsz` sits directly under `moov` instead of the
    * moov/trak/mdia/minf/stbl chain; [[parseMp4Frames]] searches
    * containers recursively, so the full chain would parse too).
    * Frame count, per-frame sizes and fill bytes are id-derived:
    * n = id%5+3, size_i = (id+7i)%17+4, fill_i = (id·31+i)%251 — the
    * oracle re-derives every emitted offset/sum from the same
    * arithmetic while the spec grounds the parse in hand-built bytes.
    */
  def synthesizeMp4Frames(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def beHex(v: Column, nBytes: Int): Column = lpad(hex(v.cast("long")), nBytes * 2, "0")
    val n = (id % 5 + 3).cast("int")
    val pad = (id % 6 + 1).cast("int")
    val sizes = transform(sequence(lit(0), n - 1),
      i => (id + lit(7) * i) % 17 + 4)
    val mvhdHex = concat(
      beHex(lit(108), 4), lit("6D766864"), lit("00" * 12),
      beHex(lit(1000), 4), beHex(lit(0), 4), lit("00" * 80))
    val stszHex = concat(
      beHex(lit(20) + n * 4, 4), lit("7374737A"), lit("00" * 4), // stsz, v0
      beHex(lit(0), 4), beHex(n, 4),
      array_join(transform(sizes, s => beHex(s, 4)), ""))
    val mdatLen = aggregate(sizes, lit(0L), (a, s) => a + s)
    val framesHex = array_join(
      transform(sequence(lit(0), n - 1),
        i => repeat(beHex((id * 31 + i) % 251, 1),
          ((id + lit(7) * i) % 17 + 4).cast("int"))), "")
    val payloadHex = concat(
      beHex(lit(16), 4), lit("66747970"), lit("69736F6D"), beHex(lit(0), 4),
      beHex(pad + 8, 4), lit("66726565"), lpad(lit(""), pad * 2, lit("0")),
      beHex(lit(136) + n * 4, 4), lit("6D6F6F76"), mvhdHex, stszHex,
      beHex(mdatLen + 8, 4), lit("6D646174"), framesHex)
    docs.select(id, unhex(payloadHex).as("payload"))
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_off", LongType),
    StructField("frame_size", LongType),
    StructField("frame_sum", LongType),
    StructField("first_byte", LongType)))

  /** Frame table of an ISO BMFF payload: depth-first box walk to
    * `stsz` (recursing into the standard container boxes), per-frame
    * sizes from its table, byte offsets as prefix sums into `mdat`'s
    * data. None if any box is malformed or the mdat is short.
    */
  def parseMp4Frames(bytes: Array[Byte]): Option[Seq[(Long, Long, Long, Long)]] = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def fourCC(off: Int): String = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
    def find(from: Int, until: Int, target: String): Option[Int] = {
      var off = from
      var res: Option[Int] = None
      while (res.isEmpty && off + 8 <= until) {
        val size = beAt(bytes, off, 4).toInt
        if (size < 8) return None
        val cc = fourCC(off)
        if (cc == target) res = Some(off)
        else if (containers(cc))
          res = find(off + 8, math.min(off + size, until), target)
        if (res.isEmpty) off += size
      }
      res
    }
    if (bytes.length < 16 || fourCC(0) != "ftyp") return None
    for {
      stsz <- find(0, bytes.length, "stsz")
      mdat <- find(0, bytes.length, "mdat")
      count = beAt(bytes, stsz + 16, 4).toInt
      if stsz + 20 + 4 * count <= bytes.length
      sizes = (0 until count).map(i => beAt(bytes, stsz + 20 + 4 * i, 4))
      if mdat + 8 + sizes.sum <= bytes.length
    } yield {
      var off = (mdat + 8).toLong
      sizes.zipWithIndex.map { case (sz, i) =>
        val o = off
        off += sz
        (i.toLong, o, sz, (o until o + sz).map(j => (bytes(j.toInt) & 0xff).toLong).sum)
      }
    }
  }

  /** Sample every `every`-th frame of each payload: the frame-extract
    * stage of a video pipeline with the codec decode stubbed (no codec
    * libs in the container) — offsets, sizes, byte sums and the first
    * byte are REAL, read by the box walk, so the plumbing a decoder
    * would sit behind is fully exercised. Row-local mapPartitions, no
    * shuffle; frames-per-payload bounds the fan-out.
    */
  def sampleFrames(media: DataFrame, idCol: String, every: Int): DataFrame = {
    require(every >= 1, "sampling stride must be >= 1")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    media.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          parseMp4Frames(bytes).toSeq.flatten
            .filter(_._1 % every == 0)
            .map { case (i, off, sz, sum) =>
              // stsz permits zero-size entries; a trailing one puts off at
              // bytes.length, so only dereference when the frame has a byte
              val fb = if (sz > 0) (bytes(off.toInt) & 0xff).toLong else 0L
              Row(id, i, off, sz, sum, fb)
            }
        }
      }(enc).toDF("doc_id", "frame_idx", "frame_off", "frame_size", "frame_sum", "first_byte")
  }

  private val headerSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("w", LongType),
    StructField("h", LongType),
    StructField("hdr_off", LongType),
    StructField("payload_hex", StringType)))

  private def beAt(bytes: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
    v
  }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse (kind, width, height, headerOffset) from the leading bytes:
    * PNG reads the IHDR fixed layout (w/h big-endian at bytes 16/20);
    * JPEG walks the marker stream — skipping each segment by its
    * declared length — until an SOF0-SOF3 frame header, then reads
    * height/width at +5/+7. Returns None for anything unparseable
    * (truncated, wrong signature, marker desync).
    */
  def parseHeader(bytes: Array[Byte]): Option[(String, Long, Long, Long)] =
    if (bytes.length >= 26 && bytes.take(8).sameElements(PngSig) &&
        new String(bytes.slice(12, 16), "US-ASCII") == "IHDR") {
      Some(("png", beAt(bytes, 16, 4), beAt(bytes, 20, 4), 16L))
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var off = 2
      var res: Option[(String, Long, Long, Long)] = None
      var ok = true
      while (ok && res.isEmpty && off + 9 <= bytes.length) {
        if ((bytes(off) & 0xff) != 0xff) ok = false // marker desync
        else {
          val marker = bytes(off + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xc3) {
            res = Some(("jpeg", beAt(bytes, off + 7, 2), beAt(bytes, off + 5, 2), off.toLong))
          } else off += 2 + beAt(bytes, off + 2, 2).toInt
        }
      }
      res
    } else None

  /** Decode header metadata for a (id, payload) media table via the
    * same batched `mapPartitions` shape as [[stubDecode]] — this is
    * the honest version for the fields a header carries. Unparseable
    * payloads are dropped (a production pipeline would dead-letter
    * them; filter semantics keep this query SQL-checkable).
    * `withPayloadHex` additionally emits the payload as a hex string,
    * which is what lets the DuckDB oracle re-derive every field with
    * plain string math.
    */
  def decodeHeaders(media: DataFrame, idCol: String, withPayloadHex: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(headerSchema)
    val decoded = media.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          parseHeader(bytes).map { case (kind, w, h, off) =>
            Row(id, kind, w, h, off, bytes.map(b => f"$b%02X").mkString)
          }
        }
      }(enc).toDF("doc_id", "kind", "w", "h", "hdr_off", "payload_hex")
    if (withPayloadHex) decoded else decoded.drop("payload_hex")
  }

  def stubDecode(binaryDocs: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    binaryDocs.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feats = (0 until 8).map { i =>
            if (i < bytes.length) bytes(i).toFloat / 255f else 0f
          }.toArray
          Row(id, bytes.length, feats)
        }
      }(enc).toDF("doc_id", "n_bytes", "features")
  }
}
