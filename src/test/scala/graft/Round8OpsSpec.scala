package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-8 operator semantics: cache-scope idempotency plus the round's
  * fidelity/robustness fixes. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("DedupCaches.track is idempotent: re-tracking a cached plan neither re-caches nor steals ownership") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val owner = new ops.DedupCaches
    val first = owner.track(df)
    assert(first.storageLevel != StorageLevel.NONE)
    // a second handle over the SAME frame must not re-register it:
    // unpersistAll on the second handle leaves the owner's cache alive
    val second = new ops.DedupCaches
    second.track(df)
    second.unpersistAll()
    assert(df.storageLevel != StorageLevel.NONE,
      "non-owning handle must not unpersist another scope's cache")
    owner.unpersistAll()
    assert(df.storageLevel == StorageLevel.NONE)
    // unmanaged: same idempotency, plain cache
    val again = ops.DedupCaches.unmanaged.track(df)
    assert(again.storageLevel != StorageLevel.NONE)
    ops.DedupCaches.unmanaged.track(df) // no re-cache warning path
    df.unpersist()
  }
}
