package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Dedup

/** Property tests: every fused custom expression must be bit-identical
  * to its composable HOF reference on ARBITRARY inputs, not just the
  * well-formed testdata corpus — whitespace runs, empty strings,
  * unicode, single tokens, repeated tokens. (Raw scalacheck generators
  * with a fixed seed; the scalatest bridge artifact isn't in the
  * offline cache.)
  */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long = 42L): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  // Text that stresses the tokenizer: unicode words, space runs, empties
  // (Spark trim strips 0x20 only — generators stay within that contract).
  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("über", "naïve", "日本語", "a", "", "x#y"))
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(12, wordGen)
    seps <- Gen.listOfN(12, Gen.oneOf(" ", "  ", "   "))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  private lazy val texts = samples(textGen, 120)

  private def assertColumnsEqual(fused: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column): Unit = {
    val df = texts.toDF("text")
    val bad = df.select($"text", fused.as("f"), hof.as("h"))
      .filter(not($"f" <=> $"h")).limit(3).collect()
    assert(bad.isEmpty, s"fused != HOF, e.g.: ${bad.mkString("; ")}")
  }

  test("WordShingles == shinglesHof on arbitrary text") {
    assertColumnsEqual(
      TextFunctions.shingles($"text", 3), TextFunctions.shinglesHof($"text", 3))
  }

  test("WinnowingFingerprints == HOF on arbitrary text") {
    assertColumnsEqual(
      TextFunctions.winnowingFingerprints($"text", 3, 4),
      TextFunctions.winnowingFingerprintsHof($"text", 3, 4))
  }

  test("MinShingleMd5 == HOF on arbitrary text") {
    assertColumnsEqual(
      TextFunctions.minShingleFingerprint($"text", 3),
      TextFunctions.minShingleFingerprintHof($"text", 3))
  }

  test("SimHash64 == HOF on arbitrary token arrays") {
    assertColumnsEqual(
      Dedup.simhash64(TextFunctions.tokens($"text")),
      Dedup.simhash64Hof(TextFunctions.tokens($"text")))
  }

  test("MinHashSignatureMd5 == HOF on arbitrary shingle arrays") {
    assertColumnsEqual(
      Dedup.minhashSignatureMd5(TextFunctions.shingles($"text", 2), 8),
      Dedup.minhashSignatureMd5Hof(TextFunctions.shingles($"text", 2), 8))
  }

  test("HyperplaneSignature == HOF on arbitrary float vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val vecs = samples(vecGen, 80).map(_.toArray)
    val df = vecs.toDF("v")
    val diff = df.select(
      VectorFunctions.hyperplaneSignature($"v", 8).as("f"),
      VectorFunctions.hyperplaneSignatureHof($"v", 8).as("h"))
      .filter(not($"f" <=> $"h")).count()
    assert(diff === 0)
  }

  test("HyperplaneSignatureMd5 == HOF on arbitrary float vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val vecs = samples(vecGen, 80).map(_.toArray)
    val df = vecs.toDF("v")
    val diff = df.select(
      VectorFunctions.hyperplaneSignatureMd5($"v", 8).as("f"),
      VectorFunctions.hyperplaneSignatureMd5Hof($"v", 8).as("h"))
      .filter(not($"f" <=> $"h")).count()
    assert(diff === 0)
  }

  test("Avro codec round-trips arbitrary values (JVM-level property)") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val schema =
      """{"type":"record","name":"P","fields":[
        |  {"name":"s","type":"string"},
        |  {"name":"os","type":["null","string"],"default":null},
        |  {"name":"i","type":"int"},
        |  {"name":"l","type":"long"},
        |  {"name":"d","type":"double"},
        |  {"name":"b","type":"boolean"}
        |]}""".stripMargin
    val gen = for {
      s <- Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("", "日本語", "a\"b\\c", "line\nbreak"))
      os <- Gen.option(Gen.alphaNumStr)
      i <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      l <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      d <- Gen.oneOf(Gen.chooseNum(-1e18, 1e18), Gen.oneOf(0.0, -0.0, Double.MaxValue))
      b <- Gen.oneOf(true, false)
    } yield (s, os, i, l, d, b)
    samples(gen, 200, seed0 = 7L).zipWithIndex.foreach { case ((s, os, i, l, d, b), idx) =>
      val row = new GenericInternalRow(Array[Any](
        UTF8String.fromString(s), os.map(UTF8String.fromString).orNull,
        i, l, d, b))
      val bytes = graft.avro.AvroCodec.encode(row, schema, schemaId = idx)
      assert(graft.avro.AvroCodec.frameSchemaId(bytes) === idx)
      val back = graft.avro.AvroCodec.decode(bytes, schema, permissive = false)
      assert(back.getUTF8String(0).toString === s)
      assert(Option(back.getUTF8String(1)).map(_.toString) === os)
      assert(back.getInt(2) === i && back.getLong(3) === l)
      assert(java.lang.Double.compare(back.getDouble(4), d) === 0)
      assert(back.getBoolean(5) === b)
    }
  }

  test("decodeRegistry dispatches arbitrary id mixes: mapped ids decode " +
      "under their own writer, unmapped follow the mode (r17 property)") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val v1 =
      """{"type":"record","name":"P","fields":[
        |  {"name":"s","type":"string"},
        |  {"name":"i","type":"int"}
        |]}""".stripMargin
    // v2 adds a defaulted field and reorders — the standard evolution pair
    val v2 =
      """{"type":"record","name":"P","fields":[
        |  {"name":"i","type":"int"},
        |  {"name":"s","type":"string"},
        |  {"name":"t","type":"string","default":"dflt"}
        |]}""".stripMargin
    val reg = new java.util.HashMap[Integer, String]()
    reg.put(3, v1); reg.put(9, v2)
    val gen = for {
      s <- Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("", "日本語", "a\"b\\c"))
      i <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      t <- Gen.alphaNumStr
      id <- Gen.oneOf(3, 9, 4, 100, -1) // two mapped, three unmapped
    } yield (s, i, t, id)
    samples(gen, 300, seed0 = 11L).foreach { case (s, i, t, id) =>
      val bytes =
        if (id == 3) graft.avro.AvroCodec.encode(new GenericInternalRow(
          Array[Any](UTF8String.fromString(s), i)), v1, schemaId = id)
        else graft.avro.AvroCodec.encode(new GenericInternalRow(
          Array[Any](i, UTF8String.fromString(s), UTF8String.fromString(t))),
          v2, schemaId = id)
      if (id == 3 || id == 9) {
        val back = graft.avro.AvroCodec.decodeRegistry(bytes, reg, v2,
          permissive = false)
        // reader layout is v2's: (i, s, t); v1-written rows default t
        assert(back.getInt(0) === i)
        assert(back.getUTF8String(1).toString === s)
        assert(back.getUTF8String(2).toString === (if (id == 3) "dflt" else t))
      } else {
        val e = intercept[graft.avro.AvroCodec.UnknownSchemaIdException] {
          graft.avro.AvroCodec.decodeRegistry(bytes, reg, v2, permissive = false)
        }
        assert(e.id === id)
        assert(graft.avro.AvroCodec.decodeRegistry(bytes, reg, v2,
          permissive = true) == null)
      }
    }
    // bad frames follow the mode too (never UnknownSchemaIdException)
    intercept[IllegalArgumentException] {
      graft.avro.AvroCodec.decodeRegistry(Array[Byte](1, 2), reg, v2,
        permissive = false)
    }
    assert(graft.avro.AvroCodec.decodeRegistry(Array[Byte](1, 2), reg, v2,
      permissive = true) == null)
  }

  test("CosineSimilarity == HOF on equal-length vectors incl. zero vectors") {
    val vecGen = Gen.listOfN(8, Gen.frequency(
      4 -> Gen.chooseNum(-5.0f, 5.0f), 1 -> Gen.const(0.0f)))
    val pairs = samples(Gen.zip(vecGen, vecGen), 80)
      .map { case (a, b) => (a.toArray, b.toArray) }
    // include exact zero vectors on both sides
    val all = pairs ++ Seq(
      (Array.fill(8)(0.0f), pairs.head._2),
      (pairs.head._1, Array.fill(8)(0.0f)))
    val df = all.toDF("a", "b")
    val diff = df.select(
      VectorFunctions.cosine($"a", $"b").as("f"),
      VectorFunctions.cosineHof($"a", $"b").as("h"))
      .filter(not($"f" <=> $"h")).count()
    assert(diff === 0)
  }

  test("fused/HOF parity on the degenerate input classes (r13 review)") {
    // empty vector: sequence(0,-1) DESCENDS in Spark, so the unguarded
    // HOF threw while the fused kernel emitted all-ones; null vector:
    // the unguarded HOF minted all-zeros while the fused kernel nulled
    val vecs = Seq(
      Some(Array.empty[Float]),
      None,
      Some(Array(1.0f, -2.0f))).toDF("v")
    for ((f, h) <- Seq(
        (VectorFunctions.hyperplaneSignature($"v", 6),
          VectorFunctions.hyperplaneSignatureHof($"v", 6)),
        (VectorFunctions.hyperplaneSignatureMd5($"v", 6),
          VectorFunctions.hyperplaneSignatureMd5Hof($"v", 6)))) {
      val diff = vecs.select(f.as("f"), h.as("h"))
        .filter(not($"f" <=> $"h")).count()
      assert(diff === 0, "hyperplane fused/HOF diverge on empty/null vectors")
    }
    // cosine: a zero-norm side of a LENGTH-MISMATCHED pair must not
    // short-circuit the HOF to 0.0 while the fused path nulls it
    val pairs = Seq(
      (Array(0.0f, 0.0f), Array(0.0f)),          // zero-norm + mismatch -> null
      (Array(1.0f, 2.0f), Array(1.0f)),          // plain mismatch -> null
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)))    // zero-norm, equal length -> 0.0
      .toDF("a", "b")
    val cdiff = pairs.select(
      VectorFunctions.cosine($"a", $"b").as("f"),
      VectorFunctions.cosineHof($"a", $"b").as("h"))
      .filter(not($"f" <=> $"h")).count()
    assert(cdiff === 0, "cosine fused/HOF diverge on mismatched/zero-norm pairs")
    val got = pairs.select(VectorFunctions.cosine($"a", $"b")).collect()
      .map(r => Option(r.get(0)))
    assert(got.toSeq === Seq(None, None, Some(0.0)))
    // NULL ELEMENTS (r14): the declared type admits containsNull arrays;
    // an unguarded getFloat read an UnsafeArrayData null slot as 0.0f
    // under codegen while NPE-ing interpreted — both must yield NULL,
    // matching the zip_with HOF (which nulls the aggregate)
    val withNullElem = Seq(
      (Seq(Some(1.0f), None, Some(2.0f)), Seq(Some(1.0f), Some(1.0f), Some(1.0f))),
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(1.0f), None)))
      .toDF("a", "b")
    val nGot = withNullElem.select(
      VectorFunctions.cosine($"a", $"b").as("f"),
      VectorFunctions.cosineHof($"a", $"b").as("h")).collect()
    assert(nGot.forall(r => r.isNullAt(0)),
      "a null element must null the fused cosine, not read as 0.0f")
    assert(nGot.forall(r => r.isNullAt(0) == r.isNullAt(1)),
      "fused/HOF diverge on null elements")
  }

  test("SortedIntersectSize == size(array_intersect) on sorted-distinct arrays") {
    import org.apache.spark.sql.graft.ExprBridge
    // arbitrary token multisets, incl. empties, unicode, shared and
    // disjoint vocab — normalized exactly like AllPairsJoin.base does
    val tokGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(4)),
      Gen.oneOf("", "ü", "日本", "aa", "ab", "b"))
    val setGen = Gen.listOfN(10, tokGen)
    val pairs = samples(Gen.zip(setGen, setGen), 120) ++
      Seq((Nil, List("a")), (List("a"), Nil), (Nil, Nil))
    val df = pairs.toDF("ra", "rb").select(
      sort_array(array_distinct($"ra")).as("a"),
      sort_array(array_distinct($"rb")).as("b"))
    def fused = ExprBridge.column(graft.expressions.SortedIntersectSize(
      ExprBridge.expression($"a"), ExprBridge.expression($"b")))
    val diff = df.select(fused.as("f"),
        size(array_intersect($"a", $"b")).cast("long").as("h"))
      .filter(not($"f" <=> $"h")).count()
    assert(diff === 0)
  }

  test("SortedIntersectSize tolerates NULL elements (ADVICE r10): matches array_intersect") {
    import org.apache.spark.sql.graft.ExprBridge
    // sort_array asc puts nulls FIRST; the merge must rank null as the
    // minimum and match a both-sides null exactly once — the replaced
    // builtin's count on distinct arrays — instead of NPE-ing a task
    val rows = Seq(
      (Seq[String](null, "a", "b"), Seq[String](null, "b", "c")),
      (Seq[String](null), Seq[String]("a")),
      (Seq[String](null), Seq[String](null)),
      (Seq[String]("a", null, "c"), Seq[String]("b", "c")),
      (Seq[String](), Seq[String](null)),
      (Seq[String](null, "ü", "日本"), Seq[String]("ü", null)))
    val df = rows.toDF("ra", "rb").select(
      sort_array(array_distinct($"ra")).as("a"),
      sort_array(array_distinct($"rb")).as("b"))
    def fused = ExprBridge.column(graft.expressions.SortedIntersectSize(
      ExprBridge.expression($"a"), ExprBridge.expression($"b")))
    val got = df.select(fused.as("f"),
      size(array_intersect($"a", $"b")).cast("long").as("h"))
    val diff = got.filter(not($"f" <=> $"h")).count()
    assert(diff === 0)
  }
}
