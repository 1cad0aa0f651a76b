package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkTestBase with graft.PropHelper {
  import TextFunctions._

  private def one(c: org.apache.spark.sql.Column, text: String): Row = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("t").select(c).head
  }

  test("tokenCount edges") {
    val s = spark
    import s.implicits._
    val rows = Seq("", "   ", "one", "one two  three", "a\tb\nc")
      .toDF("t").select(tokenCount(col("t"))).collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(0, 0, 1, 3, 3))
  }

  test("wordShingles") {
    val r = one(wordShingles(col("t"), 2), "a b c a b")
    assert(r.getSeq[String](0).toSet == Set("a b", "b c", "c a"))
    assert(one(wordShingles(col("t"), 2), "solo").getSeq[String](0).isEmpty)
    assert(one(wordShingles(col("t"), 3), "x y z").getSeq[String](0) == Seq("x y z"))
  }

  test("charNgrams") {
    assert(one(charNgrams(col("t"), 3), "abcd").getSeq[String](0) == Seq("abc", "bcd"))
    assert(one(charNgrams(col("t"), 3), "ab").getSeq[String](0).isEmpty)
  }

  test("langId picks dominant stopword profile with deterministic ties") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      "the cat and the dog of the house",
      "el perro y la casa de los gatos una vez",
      "der hund und das haus ist nicht ein katze",
      "xyzzy qwerty").toDF("t")
      .select(langId(col("t"))).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("en", "es", "de", "und"))
  }

  test("fingerprint is order-sensitive and stable") {
    val a = one(fingerprint(col("t")), "abc").getLong(0)
    val b = one(fingerprint(col("t")), "acb").getLong(0)
    val a2 = one(fingerprint(col("t")), "abc").getLong(0)
    assert(a == a2 && a != b)
    // hand-computed: ((0*31+97)*31+98)*31+99 mod 1e9+7
    val expected = ((97L * 31 + 98) * 31 + 99) % 1000000007L
    assert(a == expected)
  }

  test("arrayJaccard") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("x", "y")
    assert(df.select(arrayJaccard(col("x"), col("y"))).head.getDouble(0) == 1.0 / 3.0)
  }

  test("repetition ratio: degenerate docs score high, varied docs zero") {
    val s = spark
    import s.implicits._
    def ratio(text: String): (Int, Int, Double) = {
      val total = org.apache.spark.sql.functions.greatest(
        tokenCount(col("t")) - 1, org.apache.spark.sql.functions.lit(0))
      val dist = org.apache.spark.sql.functions.size(
        graft.functions.word_shingles(col("t"), 2))
      val r = Seq(text).toDF("t").select(total, dist,
        org.apache.spark.sql.functions.when(total === 0,
          org.apache.spark.sql.functions.lit(0.0))
          .otherwise(org.apache.spark.sql.functions.lit(1.0) -
            dist.cast("double") / total.cast("double"))).head()
      (r.getInt(0), r.getInt(1), r.getDouble(2))
    }
    assert(ratio("a a a a") == ((3, 1, 1.0 - 1.0 / 3.0))) // one distinct 2-gram, 3 total
    assert(ratio("w x y z") == ((3, 3, 0.0)))       // all distinct
    assert(ratio("solo") == ((0, 0, 0.0)))          // no 2-grams at all
    assert(ratio("") == ((0, 0, 0.0)))
  }

  test("piiScrub redacts every class; counts match what was replaced") {
    val s = spark
    import s.implicits._
    def scrub(text: String): String =
      Seq(Tuple1(text)).toDF("t")
        .select(TextFunctions.piiScrub(col("t"))).head().getString(0)

    assert(scrub("mail bob.smith+x@corp.example.co now") == "mail <EMAIL> now")
    assert(scrub("ssn 078-05-1120.") == "ssn <SSN>.")
    assert(scrub("card 4111 1111 1111 1111!") == "card <CC>!")
    assert(scrub("call 212-555-0199 or 212.555.0188") == "call <PHONE> or <PHONE>")
    assert(scrub("host 192.168.0.1 up") == "host <IP> up")
    // a card number is ONE <CC>, never phone fragments (ordering)
    assert(scrub("4111-1111-1111-1111") == "<CC>")
    // clean text is untouched
    assert(scrub("just words 123 and 45.6") == "just words 123 and 45.6")
    // longer digit/separator runs are NOT partially eaten (\b anchors):
    // neither a 4-3-5 run as <PHONE> nor a 4-2-5 run as <SSN>
    assert(scrub("1234-567-89012") == "1234-567-89012")
    assert(scrub("1234-56-78901") == "1234-56-78901")
    // everything at once
    assert(scrub("a@b.io 078-05-1120 4111 1111 1111 1111 212-555-0199 10.0.0.7")
      == "<EMAIL> <SSN> <CC> <PHONE> <IP>")

    val counts = Seq(Tuple1("a@b.io c@d.io 078-05-1120 212-555-0199 10.0.0.7"))
      .toDF("t").select(TextFunctions.piiCounts(col("t")).as("c"))
      .select("c.emails", "c.ssns", "c.ccs", "c.phones", "c.ips").head()
    assert((counts.getInt(0), counts.getInt(1), counts.getInt(2),
      counts.getInt(3), counts.getInt(4)) == ((2, 1, 0, 1, 1)))
  }

  test("piiScrub property: generated PII never survives scrubbing") {
    import org.scalacheck.Gen
    val word = Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    val noise = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val digits = (n: Int) => Gen.stringOfN(n, Gen.numChar)
    val email = for { l <- word; d <- word } yield s"$l@$d.com"
    val ssn = for { a <- digits(3); b <- digits(2); c <- digits(4) } yield s"$a-$b-$c"
    val phone = for { a <- digits(3); b <- digits(3); c <- digits(4) } yield s"$a-$b-$c"
    val ip = Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString("."))
    val pii = Gen.oneOf(email, ssn, phone, ip)
    val embedded = for { pre <- noise; p <- pii; post <- noise }
      yield s"$pre $p $post"

    val s = spark
    import s.implicits._
    forAllGen(Gen.listOfN(50, embedded), trials = 4) { texts =>
      val scrubbed = texts.toDF("t")
        .select(TextFunctions.piiScrub(col("t"))).collect().map(_.getString(0))
      scrubbed.zip(texts).foreach { case (out, in) =>
        TextFunctions.piiPatterns.foreach { case (p, _) =>
          assert(!p.r.findFirstIn(out).isDefined,
            s"pattern $p survived: [$in] -> [$out]")
        }
        assert(out.contains("<"), s"nothing redacted in [$in] -> [$out]")
      }
    }
  }
}
