package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent materialization of INDEPENDENT gate legs (optimization
  * guide §2.6: actions are only sequential because driver code calls
  * them sequentially — submitting independent jobs from a small
  * thread pool lets one leg's task tail back-fill cores the other
  * leg leaves idle).
  *
  * Motivation (r13 bench scheduler diagnostics): the agreement gates
  * build two independent sides — brute ground truth vs approximate
  * path, direct build vs merged build — and eagerly checkpoint each
  * in sequence; measured utilization on those rows is 2-6 of 32
  * cores, so the second leg's latency is pure serial overhead the
  * scheduler could have hidden. Overlapping legs changes NOTHING
  * about what a query computes (each thunk returns the same frame it
  * would have returned inline; failures rethrow on the caller
  * thread) — it only moves wall-clock.
  *
  * The pool is small (4) and daemon: enough to fill a leg's tail,
  * not enough to thrash the scheduler (guide: "2-3 jobs in flight is
  * plenty"). Spark's FIFO scheduler gives the earlier job priority
  * and back-fills the later — exactly the wanted behavior. Job
  * descriptions are thread-local, so each leg labels its own jobs.
  */
private[graft] object Par {

  // sized above the widest fan-out below (5) so legs never queue
  // behind each other; Spark's FIFO scheduler arbitrates the actual
  // core competition between the submitted jobs
  private lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(6, r => {
        val t = new Thread(r, "graft-gate-leg")
        t.setDaemon(true)
        t
      }))

  /** Evaluate two independent legs concurrently. */
  def two[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }

  /** Evaluate three independent legs concurrently. */
  def three[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    val fc = Future(c)(pool)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf))
  }

  /** Evaluate four independent legs concurrently. */
  def four[A, B, C, D](a: => A, b: => B, c: => C, d: => D)
      : (A, B, C, D) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    val fc = Future(c)(pool)
    val fd = Future(d)(pool)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf), Await.result(fd, Duration.Inf))
  }

  /** Evaluate a sequence of independent thunks concurrently,
    * preserving order. Used for per-table staging writes inside a
    * multi-table transaction (each stages under its own tx-private
    * dir, so the writes share nothing but the scheduler).
    */
  def all[T](thunks: Seq[() => T]): Seq[T] =
    if (thunks.sizeIs <= 1) thunks.map(_.apply())
    else thunks.map(t => Future(t())(pool))
      .map(Await.result(_, Duration.Inf))

  /** Evaluate five independent legs concurrently. */
  def five[A, B, C, D, E](a: => A, b: => B, c: => C, d: => D, e: => E)
      : (A, B, C, D, E) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    val fc = Future(c)(pool)
    val fd = Future(d)(pool)
    val fe = Future(e)(pool)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf), Await.result(fd, Duration.Inf),
      Await.result(fe, Duration.Inf))
  }
}
