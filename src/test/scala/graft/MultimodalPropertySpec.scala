package graft

import graft.multimodal.Multimodal

/** Seeded-random round-trip properties for the pure-JDK media plumbing —
  * the fixed-fixture specs pin known shapes; these walk the odd corners
  * (odd-length frames and their pad bytes, extreme sample values, empty
  * frames) where offset arithmetic actually breaks. */
class MultimodalPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def cc(s: String) = s.getBytes("US-ASCII")
  private def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Hand-rolled AVI writer independent of the generator under test:
    * movi LIST of 00dc chunks, even-padded. */
  private def aviOf(frames: Seq[Array[Byte]]): Array[Byte] = {
    val movi = new java.io.ByteArrayOutputStream()
    movi.write(cc("movi"))
    frames.foreach { f =>
      movi.write(cc("00dc")); movi.write(le32(f.length)); movi.write(f)
      if ((f.length & 1) == 1) movi.write(0)
    }
    val body = cc("AVI ") ++ cc("LIST") ++ le32(movi.size()) ++ movi.toByteArray
    cc("RIFF") ++ le32(body.length) ++ body
  }

  test("AVI demux round-trips arbitrary frame payloads (incl. odd/empty lengths)") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 30) {
      val nFrames = 1 + rnd.nextInt(12)
      val frames = Seq.fill(nFrames) {
        // 0-length and odd-length frames exercise the pad-byte arithmetic
        val len = rnd.nextInt(34)
        val f = new Array[Byte](len); rnd.nextBytes(f); f
      }
      val avi = aviOf(frames)
      val media = Seq(Multimodal.MediaRecord(trial.toLong, "avi", avi,
        avi.length.toLong)).toDS()
      val out = Multimodal.sampleFrames(media, 256, 1, 100)
        .collect().sortBy(_.frame_idx)
      assert(out.length === frames.length, s"trial $trial")
      out.zip(frames).foreach { case (got, want) =>
        assert(got.frame.toSeq === want.toSeq, s"trial $trial")
        assert(got.frame_bytes === want.length.toLong, s"trial $trial")
      }
    }
  }

  test("WAV decode round-trips random 16-bit samples, mono and stereo") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 20) {
      val channels = 1 + rnd.nextInt(2)
      val frames = 1 + rnd.nextInt(40)
      // full Short range, incl. the Short.MinValue sign-extension corner
      val xs = Seq.fill(frames * channels)(
        if (rnd.nextInt(10) == 0) Short.MinValue.toInt
        else rnd.nextInt(65536) - 32768)
      val data = new Array[Byte](xs.size * 2)
      xs.zipWithIndex.foreach { case (s, j) =>
        data(2 * j) = (s & 0xff).toByte; data(2 * j + 1) = ((s >> 8) & 0xff).toByte
      }
      val blockAlign = channels * 2
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(cc("RIFF")).putInt(36 + data.length).put(cc("WAVE"))
        .put(cc("fmt ")).putInt(16).putShort(1).putShort(channels.toShort)
        .putInt(8000).putInt(8000 * blockAlign)
        .putShort(blockAlign.toShort).putShort(16)
        .put(cc("data")).putInt(data.length).put(data)
      val wav = bb.array()
      val media = Seq(Multimodal.MediaRecord(trial.toLong, "wav", wav,
        wav.length.toLong)).toDS()
      val f = Multimodal.decodeFeatures(media).head().features
      val chSums = (0 until channels).map(c =>
        xs.zipWithIndex.collect { case (s, j) if j % channels == c => s.toLong }.sum)
      assert(f.map(_.toLong).toSeq === Seq[Long](8000, channels, 16, frames,
        xs.min, xs.max, xs.map(_.toLong).sum, xs.head,
        chSums.head, if (channels == 2) chSums(1) else 0L), s"trial $trial")
    }
  }

  test("k-means assignment equals a driver-side reference argmin") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = Tables.t(spark, Sf, "embeddings")
    val k = 8
    val got = Similarity.kmeansAssign(emb, "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reference: exact integer argmin computed driver-side with plain Scala
    def quant(a: Seq[Float]): Array[Long] =
      a.map(x => math.floor(x.toDouble * 1000).toLong).toArray
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quant(r.getSeq[Float](1))).toMap
    def nsq(v: Array[Long]) = v.map(x => x * x).sum
    val cents = vecs.filter(_._1 < k)
    vecs.foreach { case (id, q) =>
      val (bestCid, bestDist) = cents.toSeq.map { case (cid, cq) =>
        val dot = q.zip(cq).map { case (a, b) => a * b }.sum
        (cid, nsq(q) + nsq(cq) - 2 * dot)
      }.minBy { case (cid, dist) => (dist, cid) }
      assert(got(id) === ((bestCid, bestDist)), s"vec $id")
    }
  }
}
