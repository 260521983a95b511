package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.streaming.Events
import graft.streaming.Events.{ItemEvent, UserState}

/** W2 TTL semantics (Redis EXPIRE twin) unit-tested directly against
  * the state-update function with TestGroupState — processing-time
  * timeouts can't be driven through MemoryStream. */
class StateTtlSpec extends SparkSpec {

  private def ev(ids: String*) = ids.map(ItemEvent("u1", _, "view")).iterator

  test("fresh key: state created, TTL armed, list emitted") {
    val st = TestGroupState.create[UserState](
      Optional.empty[UserState](), GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]], false)
    val out = Events.updateUserItems(3, Some("24 hours"))("u1", ev("a", "b"), st).toList
    assert(out.map(_.items) === List(List("b", "a")))
    assert(st.exists && st.get.items === List("b", "a"))
    assert(st.getTimeoutTimestampMs.isPresent) // EXPIRE armed
  }

  test("touch refreshes TTL and trims to keep") {
    val st = TestGroupState.create[UserState](
      Optional.of(UserState(List("b", "a"))), GroupStateTimeout.ProcessingTimeTimeout(),
      2000L, Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]], false)
    val out = Events.updateUserItems(3, Some("24 hours"))("u1", ev("c", "d"), st).toList
    assert(out.map(_.items) === List(List("d", "c", "b"))) // 'a' trimmed
    assert(st.getTimeoutTimestampMs.get() === 2000L + 24L * 3600 * 1000)
  }

  test("timeout fires: state evicted, nothing emitted") {
    val st = TestGroupState.create[UserState](
      Optional.of(UserState(List("b", "a"))), GroupStateTimeout.ProcessingTimeTimeout(),
      99999L, Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]], true)
    val out = Events.updateUserItems(3, Some("24 hours"))("u1", Iterator.empty, st).toList
    assert(out.isEmpty && st.isRemoved)
  }
}
