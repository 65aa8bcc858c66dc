package graft.watch

import graft.config.TaskConfig
import java.time.{DayOfWeek, LocalDateTime, LocalTime}
import org.scalatest.funsuite.AnyFunSuite

class SchedulerSpec extends AnyFunSuite {
  import Scheduler._

  private val now = LocalDateTime.of(2026, 8, 12, 10, 30, 0) // a Wednesday

  test("minutes / hours intervals") {
    assert(nextFire(now, Spec("minutes", 5, None, None, recurring = true)) ==
      now.plusMinutes(5))
    assert(nextFire(now, Spec("hours", 2, None, None, recurring = true)) ==
      now.plusHours(2))
  }

  test("daily at a time later today fires today, earlier fires tomorrow") {
    val later = Spec("daily", 1, None, Some(LocalTime.of(23, 0)), recurring = true)
    assert(nextFire(now, later) == now.toLocalDate.atTime(23, 0))
    val earlier = Spec("daily", 1, None, Some(LocalTime.of(9, 0)), recurring = true)
    assert(nextFire(now, earlier) == now.toLocalDate.plusDays(1).atTime(9, 0))
  }

  test("weekly lands on the requested weekday") {
    val spec = Spec("weekly", 1, Some(DayOfWeek.MONDAY), Some(LocalTime.of(8, 0)), recurring = true)
    val fire = nextFire(now, spec)
    assert(fire.getDayOfWeek == DayOfWeek.MONDAY && fire.isAfter(now))
    assert(fire.toLocalTime == LocalTime.of(8, 0))
  }

  test("spec parses from config node, times accepts int or string") {
    def node(json: String) = TaskConfig.Node(org.json4s.jackson.JsonMethods.parse(json))
    val s = SpecFromNode(node(
      """{"recurring": true, "frequency": "weekly", "weekday": "friday", "time": "10:30"}"""))
    assert(s.weekday.contains(DayOfWeek.FRIDAY) && s.at.contains(LocalTime.of(10, 30)))
    // int-or-string `times` (the reference's Py3 path returns 0 for ints —
    // a defect; we honor both, SURVEY.md §2.8 defect 2)
    assert(node("""{"times": "5"}""").intOpt("times").contains(5))
    assert(node("""{"times": 5}""").intOpt("times").contains(5))
  }

  test("unsupported frequency rejected") {
    assertThrows[IllegalArgumentException](
      nextFire(now, Spec("fortnightly", 1, None, None, recurring = true)))
  }
}
