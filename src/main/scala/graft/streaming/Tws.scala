package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** Arbitrary stateful streaming via Spark 4's `transformWithState` — the
  * successor API to `flatMapGroupsWithState` (SPARK-46815): typed state
  * handles (Value/List/Map), per-state TTL, and a RocksDB-backed store so
  * per-key state spills to disk instead of executor heap. At 100 TB/day
  * the state for a per-user aggregate is bounded by |users|, not input
  * volume, and RocksDB keeps it off-heap with changelog checkpointing —
  * the operator's scale story is the store's, not the processor's.
  *
  * Reference behavior mirrored: the per-user running profile the
  * reference maintains imperatively over its event feed (count of events
  * seen, id frontier) — re-expressed as a keyed stateful operator whose
  * single-batch drain equals the batch GROUP BY, which is what the
  * DuckDB twin gates.
  */
object Tws {

  /** Input row shape for [[UserProfileProcessor]]. */
  case class UserEvent(user_id: Long, event_id: Long)

  /** Running per-user profile: order-invariant longs only (count and the
    * min/max id frontier), so any arrival order and batch split yields
    * the same final row — the determinism contract the oracle needs. */
  case class UserProfile(user_id: Long, cnt: Long, min_event_id: Long,
                         max_event_id: Long)

  /** Per-user running profile as a StatefulProcessor: one ValueState row
    * per user, updated per batch, emitted per batch (Update mode). The
    * commutative-monoid merge (count-sum, min, max) is the same argument
    * that makes r3's incremental aggregate exact across deltas. */
  class UserProfileProcessor
      extends StatefulProcessor[Long, UserEvent, UserProfile] {
    @transient private var profile: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[(Long, Long, Long)](
        "profile", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues)
        : Iterator[UserProfile] = {
      var (cnt, mn, mx) =
        if (profile.exists()) profile.get()
        else (0L, Long.MaxValue, Long.MinValue)
      rows.foreach { e =>
        cnt += 1
        if (e.event_id < mn) mn = e.event_id
        if (e.event_id > mx) mx = e.event_id
      }
      profile.update((cnt, mn, mx))
      Iterator.single(UserProfile(key, cnt, mn, mx))
    }
  }

  /** Wire the processor over a typed event stream. Update mode: each
    * batch emits the keys it touched with their post-batch running
    * profile (a one-batch drain therefore emits exactly the final
    * answer; multi-batch consumers keep the last row per key). */
  def userProfiles(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor,
        TimeMode.None(), OutputMode.Update(), Encoders.product[UserProfile])
  }

  /** Backfill→streaming handoff: the same running profile, but the state
    * is SEEDED from a batch table (StatefulProcessorWithInitialState) —
    * the production pattern for turning on a streaming pipeline over a
    * corpus with history: compute the profile-to-date once in batch,
    * hand it to the operator, stream only the tail. handleInitialState
    * never emits — a key with history but no streamed events stays
    * silent until traffic touches it (the contract the oracle mirrors). */
  class UserProfileBootstrapProcessor
      extends StatefulProcessorWithInitialState[Long, UserEvent,
        UserProfile, UserProfile] {
    @transient private var profile: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[(Long, Long, Long)](
        "profile", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: UserProfile,
                                    timerValues: TimerValues): Unit =
      profile.update((initial.cnt, initial.min_event_id,
        initial.max_event_id))

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues)
        : Iterator[UserProfile] = {
      var (cnt, mn, mx) =
        if (profile.exists()) profile.get()
        else (0L, Long.MaxValue, Long.MinValue)
      rows.foreach { e =>
        cnt += 1
        if (e.event_id < mn) mn = e.event_id
        if (e.event_id > mx) mx = e.event_id
      }
      profile.update((cnt, mn, mx))
      Iterator.single(UserProfile(key, cnt, mn, mx))
    }
  }

  /** [[userProfiles]] with state seeded from `history` (already-profiled
    * batch rows). Emission is Update-mode per touched key, so only keys
    * the STREAM touches appear — merged with their seeded history. */
  def userProfilesFrom(events: Dataset[UserEvent],
                       history: Dataset[UserProfile])
      : Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserProfileBootstrapProcessor,
        TimeMode.None(), OutputMode.Update(),
        history.groupByKey(_.user_id),
        Encoders.product[UserProfile], Encoders.product[UserProfile])
  }

  /** transformWithState requires the RocksDB state store provider; set it
    * (plus changelog checkpointing, the production-shape config) for the
    * duration of `body` and restore the previous provider after. */
  def withRocksDb[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val logKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = s.conf.getOption(key)
    val prevLog = s.conf.getOption(logKey)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set(logKey, "true")
    try body finally {
      prev.fold(s.conf.unset(key))(s.conf.set(key, _))
      prevLog.fold(s.conf.unset(logKey))(s.conf.set(logKey, _))
    }
  }
}
