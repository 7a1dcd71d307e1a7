package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis, TextIndex}
import graft.sources.Tables

/** Text-analysis + multimodal tier tests: language ID accuracy on the
  * labeled corpus, quality-score invariants, token-count parity on a
  * hand-checked doc, fingerprint determinism, and the binary-payload
  * feature-extraction contract (histogram conserves bytes).
  */
class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.load(spark, TestSpark.Sf0001, "documents")

  // The sf corpus draws every doc from one shared vocabulary, so its lang
  // labels carry no textual signal; accuracy there is chance. Test the
  // classifier on a corpus whose languages have distinct trigram stock.
  test("languageId recovers the label when trigram signal exists") {
    import spark.implicits._
    val aa = "zyx wvu tsr zyx qpo wvu nml zyx tsr qpo"
    val bb = "abc def ghi abc jkl def mno abc ghi jkl"
    val train = (1L to 6L).map { i =>
      if (i % 2 == 0) (i, "aa", aa + s" zyx$i") else (i, "bb", bb + s" abc$i")
    }
    val df = train.toDF("doc_id", "lang", "text")
    val pred = TextAnalysis.languageId(df, k = 50)
    assert(pred.filter(col("pred_lang") === col("lang")).count() === 6L)
  }

  test("languageId labels docs matching no profile as unknown with score 0") {
    import spark.implicits._
    val df = Seq((1L, "aa", "abcdefghij"), (2L, "bb", "")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.languageId(df, k = 10).orderBy("doc_id").collect()
    assert(r(1).getString(2) === "unknown" && r(1).getLong(3) === 0L)
  }

  test("lexicalRichness: hand-checked pooled counts, zero-token source survives") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", "a b a"), (2L, "s1", "c"),   // tokens 4; types a,b,c; hapax b,c
      (3L, "s2", "   ")                       // whitespace-only: 0 tokens
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.lexicalRichness(df).orderBy("source").collect()
    assert(r.length == 2)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4),
      r(0).getLong(5), r(0).getLong(6)) == (2L, 4L, 3L, 2L, 750000L, 666666L))
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3),
      r(1).getLong(4)) == (1L, 0L, 0L, 0L))
    assert(r(1).isNullAt(5) && r(1).isNullAt(6),
      "zero-token source must yield NULL ratios, not 0/0")
  }

  test("zipfProfile: hand-checked head shares; shares partition the mass") {
    import spark.implicits._
    val df = Seq((1L, "s1", "a b a"), (2L, "s1", "c"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.zipfProfile(df).collect()
    assert(r.length == 1)
    // a(2) ranks 1st; top1 = 2/4, everything inside top10/top100, no tail
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4),
      r(0).getLong(5), r(0).getLong(6)) ==
      (3L, 4L, 500000L, 1000000L, 1000000L, 0L))
    // corpus law: top100 + tail == total mass (in exact ppm, pre-floor)
    val c = TextAnalysis.zipfProfile(docs).collect()
    c.foreach { row =>
      val (total, t100, tail) = (row.getLong(2), row.getLong(5), row.getLong(6))
      assert(math.abs(t100 + tail - 1000000L) <= 1L,
        s"top100+tail must cover the mass: $t100 + $tail over $total")
    }
  }

  test("charClassProfile: hand-checked class split; classes partition the bytes") {
    import spark.implicits._
    val df = Seq((1L, "s1", "ab 12!")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.charClassProfile(df).collect()
    assert(r.length == 1)
    // 6 chars: 2 alpha, 2 digit, 1 space, 1 other
    assert((r(0).getLong(2), r(0).getLong(3), r(0).getLong(4),
      r(0).getLong(5), r(0).getLong(6)) ==
      (6L, 333333L, 333333L, 166666L, 166666L))
    // corpus law: the four ppm shares cover the mass up to floor slack
    TextAnalysis.charClassProfile(docs).collect().foreach { row =>
      val s = row.getLong(3) + row.getLong(4) + row.getLong(5) + row.getLong(6)
      assert(s <= 1000000L && s >= 1000000L - 4, s"shares must partition: $s")
    }
  }

  test("lengthKsDrift: single source is distance 0; corpus D bounded in [0, 1e6]") {
    import spark.implicits._
    val one = Seq((1L, "s1", "abc", 3L), (2L, "s1", "abcdef" * 20, 120L))
      .toDF("doc_id", "source", "text", "n_chars")
    val r = TextAnalysis.lengthKsDrift(one).collect()
    assert(r.length == 1 && r(0).getLong(2) == 0L,
      "a source IS the corpus: KS distance must be 0")
    TextAnalysis.lengthKsDrift(docs).collect().foreach { row =>
      assert(row.getLong(2) >= 0L && row.getLong(2) <= 1000000L)
    }
  }

  test("sourceVocabOverlap: hand-checked Jaccard; zero-overlap pair still appears") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", "a b c"), (2L, "s2", "b c d"), (3L, "s3", "x y")
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.sourceVocabOverlap(df).orderBy("s1", "s2").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(4), x.getLong(5),
        x.getLong(6))).toSeq
    // s1={a,b,c}, s2={b,c,d}: inter 2, union 4 -> 500000;
    // s3={x,y} shares nothing — the complete grid keeps the pair
    assert(r == Seq(("s1", "s2", 2L, 4L, 500000L),
      ("s1", "s3", 0L, 5L, 0L), ("s2", "s3", 0L, 5L, 0L)))
  }

  test("wordBurstiness: hand-checked cf/df split and rank order") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.wordBurstiness(df, topK = 2).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSeq
    // a: cf 3 across 2 docs -> 1500 milli; b beats c on the word tie
    assert(r == Seq((1L, "a", 3L, 2L, 1500L), (2L, "b", 1L, 1L, 1000L)))
  }

  test("qualityScores invariants: 0 <= quality <= 1, distinct <= words <= chars") {
    val q = TextAnalysis.qualityScores(docs)
    val bad = q.filter(
      col("quality") < 0 || col("quality") > 1 ||
        col("n_distinct") > col("n_words") || col("n_words") > col("n_chars") ||
        col("ttr") < 0 || col("ttr") > 1).count()
    assert(bad === 0L)
  }

  test("qualityScores: empty/whitespace docs get NULL ratios, not a crash") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "actual words")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScores(df).orderBy("doc_id").collect()
    // ANSI mode throws on x/0 — the guards must yield NULL instead
    // (the arm Curation's low_quality gate depends on)
    assert(r(0).isNullAt(4) && r(0).isNullAt(8), "empty doc: NULL ttr/quality")
    assert(r(1).isNullAt(4) && r(1).isNullAt(8), "whitespace doc: NULL ttr/quality")
    assert(!r(2).isNullAt(8))
  }

  test("readability: hand-checked FK rational, sentence floor, vowel-less tokens, empty doc") {
    import spark.implicits._
    val df = Seq(
      // 9 words, 2 sentence runs, 9 vowel groups:
      // FK = 0.39*(9/2) + 11.8*(9/9) - 15.59 = -2.035 -> sign -1, 203 centi
      (1L, "the cat sat on a mat. it is flat!"),
      // no punctuation -> sentence floor 1; no vowels -> 0 syllables:
      // num = 39*4 - 1559*1*2 = -2962, den = 2 -> 1481 centi
      (2L, "pfft 7"),
      (3L, "")  // 0 words: sign of num 0, NULL centi
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df).orderBy("doc_id").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
        if (x.isNullAt(5)) -1L else x.getLong(5))).toSeq
    assert(r == Seq((9L, 2L, 9L, -1L, 203L), (2L, 1L, 0L, -1L, 1481L),
      (0L, 1L, 0L, 0L, -1L)))
  }

  test("tokenCounts parity on a hand-checked doc") {
    import spark.implicits._
    val df = Seq((1L, "src", "the cat, the hat!")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.tokenCounts(df).head()
    assert(r.getAs[Long]("ws_tokens") === 4L)   // the | cat, | the | hat!
    assert(r.getAs[Long]("re_tokens") === 6L)   // the cat , the hat !
  }

  test("repetitionSignals parity on hand-checked docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),                 // 4 words, top word 3/4, bigrams (a a)x2 (a b)x1, no 5-grams
      (2L, "x y z w v x y z w v"),     // 10 words, 6 5-grams, 5 distinct
      (3L, "solo")                     // 1 word, no bigrams/5-grams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(1L) === ((4L, 0.75, 0.6667, 0.0)))
    assert(r(2L) === ((10L, 0.2, 0.2222, 0.1667)))  // top bigram (x y) 2/9
    assert(r(3L) === ((1L, 1.0, 0.0, 0.0)))
  }

  test("tfidfTopTerms parity on hand-checked docs, ties break by term") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry durian durian durian")
    ).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 2, durian 1
    // idf: apple/durian (3+1)/(1+1)=2.0, banana/cherry (3+1)/(2+1)=1.3333
    val r = TextAnalysis.tfidfTopTerms(df, k = 2).orderBy("doc_id", "rank")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(4), x.getLong(5)))
    assert(r(0) === ((1L, "apple", 4.0, 1L)))      // tf 2 · 2.0
    assert(r(2) === ((2L, "banana", 1.3333, 1L)))  // tied with cherry, word asc wins
    assert(r(3) === ((2L, "cherry", 1.3333, 2L)))
    assert(r(4) === ((3L, "durian", 6.0, 1L)))     // tf 3 · 2.0
  }

  test("chunk: offsets tile the doc with the configured overlap; corpus coverage law") {
    import spark.implicits._
    val t = "x" * 230
    val small = Seq((1L, t), (2L, "short"), (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.chunk(small, size = 200, overlap = 50)
      .orderBy("doc_id", "chunk_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4).length))
    assert(r.toSeq == Seq(
      (1L, 0L, 1L, 200L, 200), (1L, 1L, 151L, 230L, 80),
      (2L, 0L, 1L, 5L, 5), (3L, 0L, 1L, 0L, 0)))
    // corpus law: first chunk starts at 1, the last ends at the doc's
    // final character, and the chunk COUNT matches the stride formula —
    // together with max(start) = 1 + 150·(count−1) this rules out any
    // skipped interior chunk, which a stride-modulus check alone misses
    val law = TextAnalysis.chunk(docs, size = 200, overlap = 50)
      .groupBy("doc_id")
      .agg(min("start").as("first"), max("start").as("lastStart"),
        max("end").as("lastEnd"), count(lit(1)).as("n"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .filter(col("first") =!= 1 || col("lastEnd") =!= col("len") ||
        col("lastStart") =!= lit(1) + lit(150) * (col("n") - 1) ||
        col("n") =!= ceil(greatest(col("len") - 50, lit(1)).cast("double") / 150.0).cast("long"))
    assert(law.isEmpty)
  }

  test("boilerplateGrams counts distinct docs, not occurrences") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox the quick brown fox"), // gram repeats IN one doc
      (2L, "the quick brown dog"),
      (3L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateGrams(df, n = 3, minDocs = 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("the quick brown" -> 2L)) // in-doc repeat counts once
  }

  test("fingerprints: identical text yields identical fingerprint, shifted text does not") {
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq((1L, t), (2L, t), (3L, "X " + t)).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df, n = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("resize: payloads bound to target, short ones untouched, deterministic") {
    val blobs = Multimodal.blobs(docs.limit(50))
    val resized = Multimodal.resize(blobs, targetBytes = 64).collect()
    val orig = blobs.collect().map(b => b.doc_id -> b.bytes).toMap
    assert(resized.nonEmpty)
    resized.foreach { b =>
      assert(b.bytes.length <= 64)
      if (orig(b.doc_id).length <= 64)
        assert(b.bytes.sameElements(orig(b.doc_id)), "short payload must pass through")
    }
    // deterministic: a second run produces identical bytes
    val again = Multimodal.resize(Multimodal.blobs(docs.limit(50)), 64)
      .collect().map(b => b.doc_id -> b.bytes.toSeq).toMap
    resized.foreach(b => assert(again(b.doc_id) == b.bytes.toSeq))
  }

  test("extractFeatures: histogram buckets sum to byte count") {
    val feats = Multimodal.extractFeatures(Multimodal.blobs(docs.limit(50)))
    val rows = feats.collect()
    assert(rows.length === 50)
    rows.foreach { f =>
      assert(f.histogram.length === 16)
      assert(f.histogram.sum === f.n_bytes, s"doc ${f.doc_id}")
    }
  }

  test("decodeImage: PNG encode→decode round trip matches the analytic formula exactly") {
    // the q215 gate's engine half, checked doc by doc against an
    // INDEPENDENT Scala rendering of the closed form (the oracle's SQL
    // is the third rendering) — integer-exact, no tolerance
    for (id <- Seq(0L, 1L, 42L, 499L, 123456789L)) {
      val f = Multimodal.decodeImage(
        Multimodal.Blob(id, Multimodal.encodeSynthPng(id)))
      val (w, h) = Multimodal.synthDims(id)
      assert(f.width == w && f.height == h, s"doc $id dims: $f")
      val want = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w)
        want(Multimodal.synthPixel(id, x, y) >> 4) += 1
      assert(f.lum_hist == want.toSeq, s"doc $id histogram")
      assert(f.lum_hist.sum == w.toLong * h, s"doc $id pixel conservation")
    }
  }

  test("decodeImage: RGB raster uses integer BT.601 luma; undecodable bytes fail loudly") {
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // raster band order is (R, G, B) regardless of the BGR byte layout
    img.getRaster.setPixel(0, 0, Array(200, 100, 50)) // luma 124 → bucket 7
    img.getRaster.setPixel(1, 0, Array(255, 255, 255)) // luma 255 → bucket 15
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = Multimodal.decodeImage(Multimodal.Blob(7L, out.toByteArray))
    assert(f.width == 2 && f.height == 1)
    assert(f.lum_hist(7) == 1L && f.lum_hist(15) == 1L && f.lum_hist.sum == 2L, s"$f")
    // non-image payloads must throw, not silently skip — a dropped row
    // would corrupt downstream join/dedup cardinalities
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Multimodal.Blob(9L, "not an image".getBytes("UTF-8")))
    }
    assert(ex.getMessage.contains("not a JDK-decodable image"))
  }

  test("resizeImages: within-bound pass-through is byte-identical, resample matches the formula") {
    import spark.implicits._
    // doc 0 is 16x16 (within maxDim 16): bytes must pass through
    // untouched; doc 42 is 30x22: nearest-neighbor resample at exact
    // integer arithmetic, checked against an independent Scala
    // rendering of the formula (the oracle SQL is the third rendering)
    val blobs = Seq(0L, 42L).map(id =>
      Multimodal.Blob(id, Multimodal.encodeSynthPng(id))).toDS()
    val out = Multimodal.resizeImages(blobs, maxDim = 16)
      .collect().map(b => b.doc_id -> b.bytes).toMap
    assert(java.util.Arrays.equals(out(0L), Multimodal.encodeSynthPng(0L)),
      "within-bound image must pass through byte-identical")
    val f42 = Multimodal.decodeImage(Multimodal.Blob(42L, out(42L)))
    val (w0, h0) = Multimodal.synthDims(42L) // (30, 22)
    val m = math.max(w0, h0)
    val (tw, th) = (w0 * 16 / m, h0 * 16 / m)
    assert(f42.width == tw && f42.height == th, s"dims: $f42")
    val want = new Array[Long](16)
    for (y <- 0 until th; x <- 0 until tw)
      want(Multimodal.synthPixel(42L, x * w0 / tw, y * h0 / th) >> 4) += 1
    assert(f42.lum_hist == want.toSeq, "resampled histogram must match the formula")
    // RGB payloads stay 3-band through the resample
    val img = new java.awt.image.BufferedImage(40, 10,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.getRaster.setPixel(39, 9, Array(200, 100, 50))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rgb = Multimodal.resizeImages(
      Seq(Multimodal.Blob(7L, bos.toByteArray)).toDS(), maxDim = 16)
      .collect().head
    val rimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rgb.bytes))
    assert(rimg.getWidth == 16 && rimg.getHeight == 4 && rimg.getRaster.getNumBands == 3)
  }

  /** The synthetic gray image in any JDK-writable format. */
  private def encodeSynth(id: Long, fmt: String): Array[Byte] = {
    val (w, h) = Multimodal.synthDims(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, Multimodal.synthPixel(id, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK $fmt writer")
    bos.toByteArray
  }

  private def analyticHist(id: Long): Seq[Long] = {
    val (w, h) = Multimodal.synthDims(id)
    val want = new Array[Long](16)
    for (y <- 0 until h; x <- 0 until w)
      want(Multimodal.synthPixel(id, x, y) >> 4) += 1
    want.toSeq
  }

  test("decodeImage: BMP and GIF round trips are lossless — same analytic features as PNG") {
    // both formats are lossless for 8-bit gray (BMP stores samples,
    // GIF a ≤256-entry palette), so the q215 analytic oracle applies
    // unchanged; GIF additionally exercises the IndexColorModel path
    // (raster samples are palette INDICES, resolved before the luma)
    for (fmt <- Seq("bmp", "gif"); id <- Seq(0L, 42L, 499L)) {
      val f = Multimodal.decodeImage(Multimodal.Blob(id, encodeSynth(id, fmt)))
      val (w, h) = Multimodal.synthDims(id)
      assert(f.width == w && f.height == h, s"$fmt $id dims: $f")
      assert(f.lum_hist == analyticHist(id), s"$fmt $id histogram")
    }
  }

  test("decodeImage: JPEG smoke — exact dims, pixel conservation, near-constant recovery") {
    // JPEG is lossy, so no hash law — the smoke pins what IS exact
    // (dims, one histogram entry per pixel) plus a tolerance property:
    // a constant-gray image is DC-only and must decode into the true
    // bucket or its neighbors
    val (w, h, v) = (40, 24, 100)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, v)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no JDK jpg writer")
    val f = Multimodal.decodeImage(Multimodal.Blob(11L, bos.toByteArray))
    assert(f.width == w && f.height == h, s"jpeg dims: $f")
    assert(f.lum_hist.sum == w.toLong * h, "jpeg pixel conservation")
    val bucket = v >> 4
    val near = (math.max(0, bucket - 1) to math.min(15, bucket + 1))
      .map(f.lum_hist(_)).sum
    assert(near == w.toLong * h,
      s"constant-gray jpeg strayed past the adjacent buckets: ${f.lum_hist}")
  }

  test("decodeImage/resizeImages: 16-bit PNG normalizes to the high byte instead of crashing") {
    import spark.implicits._
    // sample = v·257 has high byte exactly v, so the >>8 normalization
    // must reproduce the 8-bit analytic features bit for bit
    val id = 42L
    val (w, h) = Multimodal.synthDims(id)
    val img16 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img16.getRaster.setSample(x, y, 0, Multimodal.synthPixel(id, x, y) * 257)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img16, "png", bos), "no 16-bit png writer")
    val f = Multimodal.decodeImage(Multimodal.Blob(id, bos.toByteArray))
    assert(f.width == w && f.height == h)
    assert(f.lum_hist == analyticHist(id),
      "16-bit samples must decode to their high byte")
    // the resample path takes the same shift: output is 8-bit gray PNG
    // whose samples are the high bytes of the nearest-neighbor sources
    val out = Multimodal.resizeImages(
      Seq(Multimodal.Blob(id, bos.toByteArray)).toDS(), maxDim = 16)
      .collect().head
    val rimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.bytes))
    val m = math.max(w, h)
    val (tw, th) = (w * 16 / m, h * 16 / m)
    assert(rimg.getWidth == tw && rimg.getHeight == th)
    assert(rimg.getRaster.getNumBands == 1)
    for (y <- 0 until th; x <- 0 until tw)
      assert(rimg.getRaster.getSample(x, y, 0)
        == Multimodal.synthPixel(id, x * w / tw, y * h / th),
        s"16-bit resample sample ($x,$y)")
  }

  test("mixedCorpus: container really varies by doc (magic bytes), features stay the closed form") {
    val blobs = Multimodal.mixedCorpus(docs.limit(30))
      .collect().map(b => b.doc_id -> b.bytes).toMap
    def magic(bytes: Array[Byte]): String =
      if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P') "png"
      else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
      else if (bytes(0) == 'G' && bytes(1) == 'I') "gif"
      else "?"
    blobs.foreach { case (id, bytes) =>
      val want = Seq("png", "bmp", "gif")((id % 3).toInt)
      assert(magic(bytes) == want, s"doc $id container")
      val f = Multimodal.decodeImage(Multimodal.Blob(id, bytes))
      assert(f.lum_hist == analyticHist(id), s"doc $id features via $want")
    }
    assert(blobs.keys.map(_ % 3).toSet.size == 3, "all three containers exercised")
  }

  test("decodeAudio: WAV encode→decode round trip matches the analytic formula exactly") {
    // the q222 gate's engine half, doc by doc against an INDEPENDENT
    // Scala rendering of the closed form (the oracle SQL is the third)
    for (id <- Seq(0L, 1L, 42L, 499L, 123456789L)) {
      val f = Multimodal.decodeAudio(
        Multimodal.Blob(id, Multimodal.encodeSynthWav(id)))
      val n = Multimodal.synthAudioLen(id)
      assert(f.sample_rate == 8000L && f.n_samples == n, s"doc $id header: $f")
      val want = new Array[Long](16)
      for (i <- 0 until n)
        want((Multimodal.synthAudioSample(id, i) + 32768) >> 12) += 1
      assert(f.amp_hist == want.toSeq, s"doc $id amplitude histogram")
      assert(f.amp_hist.sum == n.toLong, s"doc $id frame conservation")
    }
  }

  test("decodeAudio: big-endian and stereo frames profile channel 0; non-audio and non-PCM fail loudly") {
    import javax.sound.sampled._
    // stereo big-endian 16-bit PCM: 3 frames, channel 0 = (1000, -2000,
    // 30000), channel 1 = junk the profile must ignore
    val ch0 = Seq(1000, -2000, 30000)
    val bytes = new Array[Byte](12)
    ch0.zipWithIndex.foreach { case (s, i) =>
      bytes(4 * i) = ((s >> 8) & 0xFF).toByte     // ch0 hi (big-endian)
      bytes(4 * i + 1) = (s & 0xFF).toByte        // ch0 lo
      bytes(4 * i + 2) = 0x7F; bytes(4 * i + 3) = 0x33 // ch1 junk
    }
    val fmt = new AudioFormat(16000f, 16, 2, true, true)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, 3L),
      AudioFileFormat.Type.WAVE, bos)
    val f = Multimodal.decodeAudio(Multimodal.Blob(5L, bos.toByteArray))
    assert(f.sample_rate == 16000L && f.n_samples == 3L)
    val want = new Array[Long](16)
    ch0.foreach(s => want((s + 32768) >> 12) += 1)
    assert(f.amp_hist == want.toSeq, s"channel-0 histogram: $f")
    // non-audio bytes fail loudly
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodeAudio(Multimodal.Blob(9L, "not audio".getBytes("UTF-8")))
    }
    assert(ex.getMessage.contains("not a JDK-decodable audio"))
    // PCM depths other than 16-bit fail loudly, never mis-scale
    val pcm8 = new AudioFormat(8000f, 8, 1, true, false)
    val bos8 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(Array[Byte](1, 2, 3)), pcm8, 3L),
      AudioFileFormat.Type.WAVE, bos8)
    val ex8 = intercept[IllegalArgumentException] {
      Multimodal.decodeAudio(Multimodal.Blob(10L, bos8.toByteArray))
    }
    assert(ex8.getMessage.contains("16-bit PCM"))
  }

  test("decodeAudio: mixed WAV/AIFF/AU corpus — container varies by magic, features stay the closed form") {
    // the q224 gate's engine half: one clip per container family, each
    // byte-identified by its container magic (RIFF / FORM / .snd), each
    // decoding to the SAME analytic features — container variation law
    def magic(bytes: Array[Byte]): String =
      new String(bytes.take(4), "ISO-8859-1")
    val wantMagic = Map("wav" -> "RIFF", "aiff" -> "FORM", "au" -> ".snd")
    for (id <- 0L to 8L) {
      val fmt = Seq("wav", "aiff", "au")((id % 3).toInt)
      val bytes = Multimodal.encodeSynthAudio(id, fmt)
      assert(magic(bytes) == wantMagic(fmt), s"doc $id container magic")
      val f = Multimodal.decodeAudio(Multimodal.Blob(id, bytes))
      val n = Multimodal.synthAudioLen(id)
      val want = new Array[Long](16)
      for (i <- 0 until n)
        want((Multimodal.synthAudioSample(id, i) + 32768) >> 12) += 1
      assert(f.sample_rate == 8000L && f.n_samples == n, s"doc $id via $fmt: $f")
      assert(f.amp_hist == want.toSeq, s"doc $id amplitude histogram via $fmt")
    }
    // per-container equality: the SAME doc through all three containers
    // yields byte-different payloads but identical decoded features
    for (id <- Seq(7L, 123L)) {
      val feats = Seq("wav", "aiff", "au").map(f =>
        Multimodal.decodeAudio(Multimodal.Blob(id,
          Multimodal.encodeSynthAudio(id, f))))
      assert(feats.distinct.size == 1, s"doc $id container-independence: $feats")
    }
    // compressed/unknown containers stay out by contract
    val ex = intercept[IllegalArgumentException] {
      Multimodal.encodeSynthAudio(3L, "mp3")
    }
    assert(ex.getMessage.contains("lossless PCM containers only"))
  }

  test("bandNorm: sub-8-bit bands upscale to full range, deep bands high-byte shift, >16 fails") {
    import java.awt.image.{ComponentSampleModel, DataBuffer, MultiPixelPackedSampleModel}
    def norm(d: Int): Multimodal.BandNorm = {
      val sm =
        if (d <= 8) new MultiPixelPackedSampleModel(DataBuffer.TYPE_BYTE, 4, 4, d)
        else new ComponentSampleModel(DataBuffer.TYPE_USHORT, 4, 4, 1, 4, Array(0))
      Multimodal.bandNorm(sm, 1, "test", 1L)
    }
    // 4-bit: 0xF is white (255, bucket 15), not near-black 15 (the r12
    // review finding); interior values spread via s·255/15
    assert(norm(4)(0, 15) == 255 && norm(4)(0, 0) == 0)
    assert(norm(4)(0, 8) == 8 * 255 / 15)
    // 1-bit: {0, 1} → {0, 255}
    assert(norm(1)(0, 1) == 255 && norm(1)(0, 0) == 0)
    // 8-bit: identity
    assert(norm(8)(0, 200) == 200 && norm(8)(0, 0) == 0)
    // 16-bit: high byte
    assert(norm(16)(0, 0xFFFF) == 255 && norm(16)(0, 0x1234) == 0x12)
    // deeper than 16 bits fails loudly
    val sm32 = new ComponentSampleModel(DataBuffer.TYPE_INT, 4, 4, 1, 4, Array(0))
    val ex = intercept[IllegalArgumentException] {
      Multimodal.bandNorm(sm32, 1, "test", 9L)
    }
    assert(ex.getMessage.contains("32-bit band"))
  }

  test("extractAudioFeatures: decode-then-feature is partitioning-independent") {
    val sample = docs.limit(40)
    def run(parts: Int): Seq[(Long, Long, Long, Seq[Long])] =
      Multimodal.extractAudioFeatures(
          Multimodal.wavCorpus(sample).repartition(parts))
        .collect().map(f => (f.doc_id, f.sample_rate, f.n_samples, f.amp_hist))
        .sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("resizeImages: GIF palette source resolves through the palette, not raw indices") {
    import spark.implicits._
    // a 40×10 gray GIF past maxDim: the output must carry the TRUE
    // gray (palette-resolved, r=g=b), never the palette index
    val (w, h) = (40, 10)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 6 + y * 5) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "no JDK gif writer")
    val out = Multimodal.resizeImages(
      Seq(Multimodal.Blob(5L, bos.toByteArray)).toDS(), maxDim = 16)
      .collect().head
    val rimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.bytes))
    assert(rimg.getWidth == 16 && rimg.getHeight == 4)
    val rr = rimg.getRaster
    for (y <- 0 until 4; x <- 0 until 16) {
      val want = ((x * w / 16) * 6 + (y * h / 4) * 5) % 256
      for (c <- 0 until rr.getNumBands)
        assert(rr.getSample(x, y, c) == want, s"palette resample ($x,$y) band $c")
    }
  }

  test("extractImageFeatures: decode-then-feature is partitioning-independent") {
    val sample = docs.limit(40)
    def run(parts: Int): Seq[(Long, Long, Long, Seq[Long])] =
      Multimodal.extractImageFeatures(
          Multimodal.pngCorpus(sample).repartition(parts))
        .collect().map(f => (f.doc_id, f.width, f.height, f.lum_hist))
        .sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("blobMeta content_md5 matches md5 over the text column") {
    val m = Multimodal.blobMeta(docs)
      .join(docs.select(col("doc_id"), md5(col("text")).as("want")), "doc_id")
    assert(m.filter(col("content_md5") =!= col("want")).count() === 0L)
  }

  test("sourceQualityGate: exact-integer mean, gate bit, every doc inherits") {
    import spark.implicits._
    // srcA: qualities 0.5·(2/2)=... compute via the real formula on tiny
    // docs — what matters is the mean and the gate, hand-checked below
    val df = Seq(
      (1L, "srcA", "alpha beta gamma delta"),     // 4 words, 4 distinct
      (2L, "srcA", "alpha alpha alpha alpha"),    // 4 words, 1 distinct
      (3L, "srcB", "one two three four five six") // 6 words, 6 distinct
    ).toDF("doc_id", "source", "text")
    // quality = min(1, n/100) * distinct/n -> d1: 0.04*1=0.04, d2:
    // 0.04*0.25=0.01, d3: 0.06*1=0.06; srcA mean (400+100)/2/10000=0.025
    val r = TextAnalysis.sourceQualityGate(df, minAvgQuality = 0.05)
      .orderBy("doc_id").collect()
    assert(r.map(_.getDouble(4)).toSeq == Seq(0.025, 0.025, 0.06))
    assert(r.map(_.getLong(5)).toSeq == Seq(0L, 0L, 1L))
    assert(r.map(_.getLong(3)).toSeq == Seq(2L, 2L, 1L))
    // corpus law: every doc appears exactly once, NULL-quality docs
    // still gated by their source's mean over the scored docs
    val gated = TextAnalysis.sourceQualityGate(docs)
    assert(gated.count() === docs.count())
    assert(gated.select("source", "src_avg_quality").distinct().count() ===
      docs.select("source").distinct().count())
  }

  test("collocations: hand-checked lift, minCount floor") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // bigrams: doc1 (a b)(b a)(a b), doc2 (a b)(b c) -> T=5, c(a b)=3
    // unigrams: a 3, b 3, c 1 -> lift(a,b) = 5*3/(3*3) = 1.6667
    val r = TextAnalysis.collocations(df, minCount = 2).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getString(0), row.getString(1)) === (("a", "b")))
    assert((row.getLong(2), row.getLong(3), row.getLong(4)) === ((3L, 3L, 3L)))
    assert(row.getDouble(5) === 1.6667)
    // floor: minCount above the max pair count yields nothing
    assert(TextAnalysis.collocations(df, minCount = 4).isEmpty)
  }

  test("truncationAudit: hand-checked cells; conservation + cumulative laws") {
    import spark.implicits._
    val df = Seq(
      (1L, "s", Seq.fill(3)("w").mkString(" ")),
      (2L, "s", Seq.tabulate(10)(i => s"w$i").mkString(" ")),
      (3L, "s", Seq.tabulate(20)(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.truncationAudit(df, maxLen = 12, bucketWidth = 8)
      .orderBy("bucket").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getDouble(6), x.getDouble(7)))
    assert(r.toSeq == Seq(
      (0L, 1L, 3L, 3L, 0L, 0.0, 0.3333),
      (1L, 1L, 10L, 10L, 0L, 0.0, 0.6667),
      (2L, 1L, 20L, 12L, 8L, 0.4, 1.0)))
    // corpus laws: tokens conserve against tokenCounts; kept + lost =
    // total; each source's last cumulative share is exactly 1.0
    val audit = TextAnalysis.truncationAudit(docs)
    val total = audit.agg(sum("tokens_total")).head.getLong(0)
    val want = TextAnalysis.tokenCounts(docs).agg(sum("ws_tokens")).head.getLong(0)
    assert(total === want)
    assert(audit.filter(
      col("tokens_kept") + col("tokens_lost") =!= col("tokens_total")).count() === 0L)
    val lastPerSrc = audit.groupBy("source")
      .agg(max(struct(col("bucket"), col("cum_doc_frac"))).as("t"))
      .select(col("t.cum_doc_frac"))
    assert(lastPerSrc.filter(col("cum_doc_frac") =!= 1.0).count() === 0L)
  }

  test("vocabCoverage: hand-checked curve; monotone and bounded on the corpus") {
    import spark.implicits._
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(df, sizes = Seq(1L, 2L, 10L))
      .orderBy("vocab_size").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      (1L, 1L, 3L, 6L, 0.5),      // top type 'a' covers 3/6
      (2L, 2L, 5L, 6L, 0.8333),   // +'b'
      (10L, 3L, 6L, 6L, 1.0)))    // whole vocab (3 types) covers all
    // corpus laws: coverage monotone in vocab_size, bounded by 1,
    // n_types <= vocab_size, covered <= total
    val c = TextAnalysis.vocabCoverage(docs).orderBy("vocab_size").collect()
    val covs = c.map(_.getDouble(4))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
    c.foreach { x =>
      assert(x.getLong(1) <= x.getLong(0) && x.getLong(2) <= x.getLong(3))
      assert(x.getDouble(4) <= 1.0)
    }
  }

  test("piiScrub: hand-checked redactions, sequential contract, total audit") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to bob.smith+x@corp.example.org today"),     // 1 email
      (2L, "ping 192.168.1.1 then call 555-123-4567"),          // 1 ip + 1 phone
      (3L, "reach admin@10.0.0.1.net at 10.0.0.1"),             // email whose domain
      // LOOKS like an ip (10.0.0.1.net) — redacted as the email, so only
      // the later bare 10.0.0.1 counts as ip (the sequential contract)
      (4L, "nothing sensitive here"),                           // 0 hits, still a row
      (5L, "v1.2.3.4 is a version not a boundary miss")         // \b: 'v' adjoins '1'
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df).orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getString(5)))
      .toMap
    assert(got(1L)._1 == ((1L, 0L, 0L, 1L)))
    assert(got(1L)._2 == "write to <EMAIL> today")
    assert(got(2L)._1 == ((0L, 1L, 1L, 2L)))
    assert(got(2L)._2 == "ping <IP> then call <PHONE>")
    assert(got(3L)._1 == ((1L, 1L, 0L, 2L)))
    assert(got(3L)._2 == "reach <EMAIL> at <IP>")
    assert(got(4L)._1 == ((0L, 0L, 0L, 0L)))
    assert(got(4L)._2 == "nothing sensitive here")
    // v1.2.3.4: '\b' sits between 'v' and '1'? no — both are word chars,
    // so \b\d{1,3}\. can only anchor at the string's interior boundaries;
    // '1.2.3.4' is preceded by 'v' (word char) -> no boundary -> no match
    assert(got(5L)._1 == ((0L, 0L, 0L, 0L)))
  }

  test("lmFamiliarity: hand-checked means, OOV rate, total audit") {
    import spark.implicits._
    // freq: a=3 b=1 c=1, total 5; ranks (count desc, word asc): a,b,c
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "   "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmFamiliarity(df, vocabTopK = 2L)
      .orderBy("doc_id").collect()
    assert(got.length === 3, "total audit: every doc gets a row")
    // doc 1: n=3, sum_c = 3+3+1 = 7 -> mean 2; no token below rank 2
    assert(got(0).getLong(1) === 3L && got(0).getLong(2) === 2L &&
      got(0).getLong(3) === 0L)
    // doc 2: n=2, sum_c = 3+1 -> mean 2; 'c' (rank 3) is OOV -> 500000
    assert(got(1).getLong(1) === 2L && got(1).getLong(2) === 2L &&
      got(1).getLong(3) === 500000L)
    // doc 3 is token-free: counted, scores NULL rather than divide
    assert(got(2).getLong(1) === 0L && got(2).isNullAt(2) && got(2).isNullAt(3))
    assert(got.forall(_.getLong(4) === 5L), "corpus_tokens on every row")
  }

  test("bm25: hand-checked exact-integer scores on a 3-doc corpus") {
    import spark.implicits._
    // D=3, T=9, invavg_ppm = 1e6*3/9 = 333333; df(cat)=2, df(dog)=1
    val df = Seq((1L, "cat dog cat"), (2L, "cat fish"),
      (3L, "bird bird bird bird")).toDF("doc_id", "text")
    val got = TextIndex.bm25Rank(df, Seq("cat", "dog"), k = 10)
      .orderBy("rank").collect()
    assert(got.length === 2, "only docs hitting >= 1 term appear")
    // doc 1, cat: tf=2 dl=3 -> denom 2e7+3e6+9*3*333333 = 31999991,
    //   tfq = 44e12 div 31999991 = 1375000; idf 3/5 -> 825000
    // doc 1, dog: tf=1 dl=3 -> denom 21999991, tfq = 1000000;
    //   idf 5/3 -> 1666666.  total 2491666, 2 hits
    val d1 = got.find(_.getLong(1) == 1L).get
    assert(d1.getLong(0) === 1L && d1.getLong(2) === 2491666L &&
      d1.getLong(3) === 2L && d1.getLong(4) === 3L)
    val d2 = got.find(_.getLong(1) == 2L).get
    assert(d2.getLong(0) === 2L && d2.getLong(3) === 1L)
    assert(d1.getLong(2) > d2.getLong(2), "two hits outrank one here")
  }

  test("bm25 law: stored-index path reproduces the scan path bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_").toString
    TextIndex.write(docs, dir)
    val stored = TextIndex.bm25(TextIndex.load(spark, dir),
      Seq("vector", "join"), k = 50).collect().toSeq
    val direct = TextIndex.bm25Rank(docs, Seq("vector", "join"), k = 50)
      .collect().toSeq
    assert(stored === direct)
  }

  test("bm25 ranks are contiguous from 1 and capped at k") {
    val r = TextIndex.bm25Rank(docs, Seq("vector"), k = 7)
      .orderBy("rank").collect()
    assert(r.length <= 7)
    assert(r.map(_.getLong(0)).toSeq === (1L to r.length).toSeq)
  }

  test("term lookup off the stored index == the corpus scan; absent term empty") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_").toString
    TextIndex.write(docs, dir)
    val idx = TextIndex.load(spark, dir)
    val viaIdx = TextIndex.lookup(idx, "vector").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaScan = docs
      .select(col("doc_id"), explode(expr(
        "filter(split(trim(text), '\\\\s+'), x -> x != '')")).as("w"))
      .filter(col("w") === "vector").groupBy("doc_id")
      .agg(count(lit(1)).as("tf")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaIdx === viaScan)
    assert(TextIndex.lookup(idx, "notaword").count() === 0L,
      "the reference CLI's not-found arm")
  }

  test("bm25 guards: empty/ill-formed terms and k < 1 fail fast") {
    assertThrows[IllegalArgumentException](TextIndex.bm25Rank(docs, Seq.empty))
    assertThrows[IllegalArgumentException](
      TextIndex.bm25Rank(docs, Seq("has space")))
    assertThrows[IllegalArgumentException](
      TextIndex.bm25Rank(docs, Seq("ok"), k = 0))
  }

  test("indexed lmFamiliarity: corpus-unseen words are OOV, stored counts score the delta") {
    import spark.implicits._
    // corpus: a×3 b×1 (ranks: a=1, b=2); delta doc 10 = "a b zz" — zz is
    // corpus-unseen; doc 11 is token-free
    val corpus = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val delta = Seq((10L, "a b zz"), (11L, "  ")).toDF("doc_id", "text")
    val got = TextIndex.lmFamiliarity(TextIndex.build(corpus), delta,
      vocabTopK = 1L).orderBy("doc_id").collect()
    assert(got.length === 2, "total audit over the delta")
    // doc 10: n=3, sum_c = c(a)+c(b)+0 = 4 -> mean 1;
    // OOV = b (rank 2 > topK 1) + zz (unseen) = 2 -> 666666 ppm
    assert(got(0).getLong(1) === 3L && got(0).getLong(2) === 1L &&
      got(0).getLong(3) === 666666L)
    assert(got(1).getLong(1) === 0L && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got.forall(_.getLong(4) === 4L), "corpus_tokens from the stored stats")
  }

  test("vocabDrift: hand-checked ppm rates and movers on crafted snapshots") {
    import spark.implicits._
    // old: a×3 b×1 (T=4); new: a×1 c×1 (T=2)
    val oldDocs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val newDocs = Seq((2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabDrift(oldDocs, newDocs)
      .orderBy(col("word")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      // a: 750000 -> 500000 (−250000); b: 250000 -> 0; c: 0 -> 500000
      ("a", 3L, 1L, 750000L, 500000L, -250000L, 250000L),
      ("b", 1L, 0L, 250000L, 0L, -250000L, 250000L),
      ("c", 0L, 1L, 0L, 500000L, 500000L, 500000L)))
  }

  test("bpePairCounts: hand-checked weighted pair counts and multiplicity") {
    import spark.implicits._
    // wf: ab×2, abc×1, aaa×1, x×1; pairs: (a,b) = 2+1 = 3 over 2 words,
    // (a,a) = 2 (within-word multiplicity in 'aaa'), (b,c) = 1;
    // single-char 'x' contributes nothing (the sequence(1,0) guard)
    val df = Seq((1L, "ab abc aaa"), (2L, "ab x")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(df, k = 10).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === Seq(
      (1L, "a", "b", 3L, 2L),
      (2L, "a", "a", 2L, 1L),
      (3L, "b", "c", 1L, 1L)))
  }

  test("vocabDrift: an empty snapshot side yields NULL rates, not a divide") {
    import spark.implicits._
    val oldDocs = Seq((1L, "a")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = TextAnalysis.vocabDrift(oldDocs, empty).collect()
    assert(r.length === 1 && r(0).getString(0) === "a")
    assert(!r(0).isNullAt(3) && r(0).isNullAt(4), "new-side rate NULL when T=0")
    assert(r(0).isNullAt(5) && r(0).isNullAt(6), "delta NULL when either side is")
  }

  test("qualityDeciles: monotone in score, ties share a bin, coverage law") {
    val d = TextAnalysis.qualityDeciles(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.nonEmpty)
    assert(d.forall(x => x._3 >= 1 && x._3 <= 10))
    // monotone: a strictly better score never lands in a lower decile;
    // equal scores always share a decile
    val byScore = d.sortBy(_._2)
    byScore.sliding(2).foreach { p =>
      if (p(0)._2 < p(1)._2) assert(p(0)._3 <= p(1)._3)
      if (p(0)._2 == p(1)._2) assert(p(0)._3 == p(1)._3)
    }
    // ceil-rank coverage: docs at-or-below decile d are >= ceil(n*d/10)
    val n = d.length
    for (dec <- 1 to 9) {
      val below = d.count(_._3 <= dec)
      assert(below >= (n * dec + 9) / 10,
        s"decile $dec covers $below of $n — below the ceil-rank floor")
    }
    // unscored (empty) docs are excluded, never bin 0
    import spark.implicits._
    val withEmpty = Seq((1L, "alpha beta gamma"), (2L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityDeciles(withEmpty).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
  }
}
