package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the battery's memo lifecycle registry — until now
  * it was exercised only implicitly through Bench runs, and round 9's
  * q176 bug (a memo released one query early because its consumer set
  * was incomplete) is exactly the class this pins. */
class MemosSpec extends AnyFunSuite {

  private def fresh(): Unit = Memos.endAll()

  test("memo survives until its LAST consumer, then releases exactly once") {
    fresh()
    var released = 0
    val token = new Object
    Memos.begin(Seq("qA", "qB", "qC"))
    Memos.track("m1", Set("qA", "qC"), token) { () => released += 1 }
    Memos.afterQuery("qA")
    assert(released == 0, "qC still pending — must not release")
    Memos.afterQuery("qB")
    assert(released == 0)
    Memos.afterQuery("qC")
    assert(released == 1, "last consumer done — must release")
    Memos.endAll()
    assert(released == 1, "endAll must not double-release")
  }

  test("re-registering with the SAME token is idempotent; a NEW token releases the old resource") {
    fresh()
    var releasedOld = 0
    var releasedNew = 0
    val t1 = new Object
    val t2 = new Object
    Memos.begin(Seq("qA", "qB"))
    Memos.track("m", Set("qB"), t1) { () => releasedOld += 1 }
    Memos.track("m", Set("qB"), t1) { () => releasedOld += 1 }
    assert(releasedOld == 0, "same-token re-track must not release")
    Memos.track("m", Set("qB"), t2) { () => releasedNew += 1 }
    assert(releasedOld == 1, "replaced entry's resources must release")
    Memos.afterQuery("qA")
    assert(releasedNew == 0)
    Memos.afterQuery("qB")
    assert(releasedNew == 1)
    Memos.endAll()
  }

  test("late registration after every consumer already ran releases immediately") {
    fresh()
    var released = 0
    Memos.begin(Seq("qA", "qB"))
    Memos.afterQuery("qA")
    Memos.track("late", Set("qA"), new Object) { () => released += 1 }
    assert(released == 1, "no remaining consumer — must not leak")
    Memos.endAll()
  }

  test("outside a battery the registry is inert until endAll") {
    fresh()
    var released = 0
    Memos.track("inert", Set("qZ"), new Object) { () => released += 1 }
    assert(released == 0, "no begin() — memos persist for the JVM")
    Memos.endAll()
    assert(released == 1)
  }
}
