package graft.watch

import graft.config.TaskConfig.TaskFile
import graft.runner.{TaskLog, TaskRunner}
import java.time.{DayOfWeek, Duration, LocalDateTime, LocalTime}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import org.apache.spark.sql.SparkSession

/** Scheduler implementing the reference's DOCUMENTED INTENT
  * (/root/reference/dasladen/processor.py:54-136, 154-173). The reference
  * snapshot's own path is defective (SURVEY.md §2.8: `runner.schedule()`
  * TypeError at processor.py:68, Py3 `basestring` NameError at
  * processor.py:190), so semantics here follow the evident design:
  *
  *  - `times`: N (int or string) → run the task list N times inline
  *  - `infinity`: true → run repeatedly
  *  - `frequency`: daily | weekly (+ `weekday`) | minutes | hours, with
  *    optional `interval` and `at` ("HH:mm") → recurring
  *  - one-shot `at`-time jobs run once at the next occurrence
  *
  * Next-fire-time computation is a pure function ([[Scheduler.nextFire]])
  * so the semantics are unit-testable without sleeping.
  */
final class Scheduler(spark: SparkSession, workDir: String, log: TaskLog) {

  private lazy val exec: ScheduledExecutorService =
    Executors.newScheduledThreadPool(1, r => {
      val t = new Thread(r, "graft-scheduler")
      t.setDaemon(true)
      t
    })

  def enqueue(file: TaskFile, origin: String): Unit = {
    val sched = file.schedule
    val times = sched.intOpt("times")
    val infinity = sched.bool("infinity")
    if (times.isDefined) {
      for (_ <- 0 until times.get) runOnce(file)
    } else if (infinity) {
      // bounded in-process loop guard replaces the reference's `while True`
      val t = new Thread(() => while (!Thread.currentThread().isInterrupted) runOnce(file))
      t.setDaemon(true)
      t.start()
    } else {
      val spec = Scheduler.SpecFromNode(sched)
      scheduleNext(file, spec)
      log.write(s"Scheduled $origin: $spec")
    }
  }

  private def scheduleNext(file: TaskFile, spec: Scheduler.Spec): Unit = {
    val delay = Duration.between(LocalDateTime.now, Scheduler.nextFire(LocalDateTime.now, spec))
    exec.schedule(new Runnable {
      def run(): Unit = {
        runOnce(file)
        if (spec.recurring) scheduleNext(file, spec)
      }
    }, math.max(delay.toMillis, 0), TimeUnit.MILLISECONDS)
    ()
  }

  private def runOnce(file: TaskFile): Unit =
    try new TaskRunner(file, spark, workDir).run(log)
    catch { case e: Exception => log.write(s"Scheduled run failed: ${e.getMessage}") }

  def shutdown(): Unit = exec.shutdownNow()
}

object Scheduler {

  /** Declarative schedule spec (frequency/interval/weekday/at). */
  final case class Spec(frequency: String, interval: Int, weekday: Option[DayOfWeek],
                        at: Option[LocalTime], recurring: Boolean) {
    override def toString: String =
      s"every $interval $frequency" +
        weekday.map(w => s" on $w").getOrElse("") +
        at.map(t => s" at $t").getOrElse("")
  }

  object SpecFromNode {
    private val weekdays = Map(
      "monday" -> DayOfWeek.MONDAY, "tuesday" -> DayOfWeek.TUESDAY,
      "wednesday" -> DayOfWeek.WEDNESDAY, "thursday" -> DayOfWeek.THURSDAY,
      "friday" -> DayOfWeek.FRIDAY, "saturday" -> DayOfWeek.SATURDAY,
      "sunday" -> DayOfWeek.SUNDAY)

    def apply(node: graft.config.TaskConfig.Node): Spec = Spec(
      frequency = node.str("frequency", "daily"),
      interval = node.int("interval", 1),
      weekday = node.strOpt("weekday").map(w =>
        weekdays.getOrElse(w.toLowerCase,
          throw new IllegalArgumentException(s"bad weekday: $w"))),
      at = node.strOpt("time").orElse(node.strOpt("at")).map(LocalTime.parse),
      recurring = node.bool("recurring"))
  }

  /** The next fire instant strictly after `now` for `spec`. */
  def nextFire(now: LocalDateTime, spec: Spec): LocalDateTime = spec.frequency match {
    case "minutes" => now.plusMinutes(spec.interval)
    case "hours"   => now.plusHours(spec.interval)
    case "daily" =>
      val t = spec.at.getOrElse(now.toLocalTime)
      val candidate = now.toLocalDate.atTime(t)
      if (candidate.isAfter(now)) candidate
      else candidate.plusDays(spec.interval)
    case "weekly" =>
      val t = spec.at.getOrElse(now.toLocalTime)
      val targetDow = spec.weekday.getOrElse(now.getDayOfWeek)
      var candidate = now.toLocalDate.atTime(t)
      while (candidate.getDayOfWeek != targetDow || !candidate.isAfter(now))
        candidate = candidate.plusDays(1)
      candidate
    case other =>
      throw new IllegalArgumentException(s"unsupported frequency: $other")
  }
}
