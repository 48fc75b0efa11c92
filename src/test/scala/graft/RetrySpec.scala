package graft

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures with 2^n backoff") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = Retry.withBackoff(maxAttempts = 5, baseDelayMs = 1000L,
      sleep = sleeps += _) {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls") else "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L)) // 2^0, 2^1 — reference's schedule
  }

  test("exhausts attempts and rethrows the last failure") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(maxAttempts = 4, baseDelayMs = 10L, sleep = sleeps += _) {
        calls += 1
        sys.error(s"always $calls")
      }
    }
    assert(e.getMessage == "always 4" && calls == 4)
    assert(sleeps.toSeq == Seq(10L, 20L, 40L))
  }

  test("non-retryable failures rethrow immediately") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.withBackoff(maxAttempts = 5,
        retryOn = { case _: IllegalStateException => true; case _ => false },
        sleep = _ => fail("should not sleep")) {
        calls += 1
        throw new IllegalArgumentException("fatal-class")
      }
    }
    assert(calls == 1)
  }
}
