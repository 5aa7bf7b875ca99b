package graft

import graft.operators.Journeys

/** [[Journeys.sessionTransitions]]: transitions are consecutive, session-
  * scoped, per-key; probabilities normalize per from_type.
  */
class JourneysSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60000000L // one minute in µs

  test("session boundary cuts the chain; probabilities normalize per from_type") {
    val ev = Seq(
      // user 1, session 1: A → B
      (1L, 1L, 0 * M, "A"), (2L, 1L, 1 * M, "B"),
      // 2-hour gap → session 2: C → D → E
      (3L, 1L, 121 * M, "C"), (4L, 1L, 122 * M, "D"), (5L, 1L, 123 * M, "E"),
      // user 2, one session: A → C
      (6L, 2L, 0 * M, "A"), (7L, 2L, 1 * M, "C")
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Journeys.sessionTransitions(ev)
      .orderBy("from_type", "to_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", "B", 1L, 0.5),
      ("A", "C", 1L, 0.5),
      ("C", "D", 1L, 1.0),
      ("D", "E", 1L, 1.0)))
    // the B → C 2-hour gap produced NO transition
    assert(!got.exists(t => t._1 == "B"))
  }
}
