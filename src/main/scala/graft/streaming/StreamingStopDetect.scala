package graft.streaming

import graft.operators.StopDetect
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental stop detection over a ping stream — the streaming twin of
  * StopDetect.stopEvents, via flatMapGroupsWithState.
  *
  * Batch-equivalence contract (verified in StreamingStopDetectSpec):
  * emitted rows match the batch operator exactly for every ping that has
  * been classified — a ping classifies when its successor arrives
  * (stationarity is forward-looking), so each user's latest ping (and any
  * still-open run) stays pending in state rather than being emitted with
  * a provisional label. Event ids are assigned at run START and are not
  * renumbered when a run is later invalidated, matching the batch cumsum
  * (invalidation happens after id assignment, reference utils.py:375-400).
  *
  * State per uid is O(open run), bounded in practice by
  * maxStayingTime/ping-cadence; assumes per-user in-order arrival across
  * batches (the reference's day-partitioned ingestion guarantees it).
  */
object StreamingStopDetect {

  final case class Ping(uid: String, latitude: Double, longitude: Double,
                        timestamp: Long)

  final case class StopRow(uid: String, stop_events: Long,
                           latitude: Double, longitude: Double,
                           timestamp: Long)

  /** prev = last unclassified ping; run/runTimes = open stationary run
    * (reversed); runId = open run's assigned id (0 = none);
    * nextId = id for the next run start.
    */
  final case class UserState(prev: Option[Ping], run: List[StopRow],
                             runTimes: List[Long], runId: Long, nextId: Long)

  def stopEvents(pings: Dataset[Ping], p: StopDetect.Params): DataFrame = {
    import pings.sparkSession.implicits._

    def dist(a: Ping, b: Ping): Double = p.metric match {
      case "euclidean" =>
        math.sqrt(math.pow(b.latitude - a.latitude, 2) +
          math.pow(b.longitude - a.longitude, 2))
      case _ => graft.plans.Haversine.compute(
        a.latitude, a.longitude, b.latitude, b.longitude)
    }

    def step(uid: String, it: Iterator[Ping],
             gs: GroupState[UserState]): Iterator[StopRow] = {
      var st = gs.getOption.getOrElse(UserState(None, Nil, Nil, 0L, 1L))
      val out = scala.collection.mutable.ArrayBuffer.empty[StopRow]
      it.toArray.sortBy(_.timestamp).foreach { cur =>
        st.prev match {
          case None => st = st.copy(prev = Some(cur))
          case Some(prev) =>
            val d = dist(prev, cur)
            val dt = cur.timestamp - prev.timestamp
            val stationary = d <= p.rC && dt <= p.maxStayingTime
            if (stationary) {
              val id = if (st.run.isEmpty) st.nextId else st.runId
              st = UserState(
                prev = Some(cur),
                run = StopRow(uid, id, prev.latitude, prev.longitude,
                  prev.timestamp) :: st.run,
                runTimes = dt :: st.runTimes,
                runId = id,
                nextId = if (st.run.isEmpty) st.nextId + 1 else st.nextId)
            } else {
              // prev is non-stationary: close any open run (its times
              // already include each event row's forward gap), emit
              // prev itself as -1
              if (st.run.nonEmpty) {
                val ok = st.run.lengthCompare(p.minSize.toInt) >= 0 &&
                  st.runTimes.sum >= p.minStayingTime
                out ++= (if (ok) st.run.reverse
                  else st.run.reverse.map(_.copy(stop_events = -1L)))
              }
              out += StopRow(uid, -1L, prev.latitude, prev.longitude,
                prev.timestamp)
              st = st.copy(prev = Some(cur), run = Nil, runTimes = Nil,
                runId = 0L)
            }
        }
      }
      gs.update(st)
      out.iterator
    }

    pings
      .groupByKey(_.uid)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
      .toDF()
  }
}
