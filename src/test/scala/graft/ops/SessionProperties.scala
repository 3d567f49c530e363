package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TradingSession

/** Property tests (SURVEY.md §5.4) over the session-classification domain
  * logic — the hhmm domain is small enough to check exhaustively, which is
  * strictly stronger than sampling. */
class SessionProperties extends AnyFunSuite {

  private val allMinutes: Seq[Int] =
    for { h <- 0 until 24; m <- 0 until 60 } yield h * 100 + m

  test("sessions never overlap: at most one session matches any minute") {
    allMinutes.foreach { hhmm =>
      val matches = TradingSession.all.filter(s => hhmm >= s.lo && hhmm <= s.hi)
      assert(matches.size <= 1, s"hhmm=$hhmm")
    }
  }

  test("union of sessions covers exactly 04:00-20:00 with no internal gaps") {
    allMinutes.foreach { hhmm =>
      val inAny = TradingSession.all.exists(s => hhmm >= s.lo && hhmm <= s.hi)
      val inWindow = hhmm >= 400 && hhmm <= 2000
      assert(inAny == inWindow, s"hhmm=$hhmm")
    }
  }

  test("boundary minutes land where the reference puts them") {
    val expect = Map(359 -> None, 400 -> Some("premarket"), 929 -> Some("premarket"),
      930 -> Some("regular"), 1600 -> Some("regular"), 1601 -> Some("afterhours"),
      2000 -> Some("afterhours"), 2001 -> None)
    expect.foreach { case (hhmm, want) =>
      val got = TradingSession.all.find(s => hhmm >= s.lo && hhmm <= s.hi).map(_.name)
      assert(got == want, s"hhmm=$hhmm")
    }
  }
}
