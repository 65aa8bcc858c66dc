package graft.transform

import org.scalatest.funsuite.AnyFunSuite

class PetlExprSpec extends AnyFunSuite {

  test("field refs and comparisons translate") {
    assert(PetlExpr.compile("{qty} > 10") == "`qty` > 10")
    assert(PetlExpr.compile("{flag} == 'A'") == "`flag` = 'A'")
    assert(PetlExpr.compile("{a} != {b}") == "`a` <> `b`")
    assert(PetlExpr.compile("{x} <= 3.5") == "`x` <= 3.5")
  }

  test("boolean operators and parens") {
    assert(PetlExpr.compile("{q} > 10 and {f} == 'A'") == "`q` > 10 AND `f` = 'A'")
    assert(PetlExpr.compile("not ({a} < 1 or {b} > 2)") == "NOT (`a` < 1 OR `b` > 2)")
  }

  test("None / membership / negation") {
    assert(PetlExpr.compile("{a} is None") == "`a` IS NULL")
    assert(PetlExpr.compile("{a} is not None") == "`a` IS NOT NULL")
    assert(PetlExpr.compile("{c} in ('x', 'y')") == "`c` IN ('x', 'y')")
    assert(PetlExpr.compile("{c} not in (1, 2)") == "`c` NOT IN (1, 2)")
    assert(PetlExpr.compile("{b} == True") == "`b` = true")
  }

  test("double-quoted strings normalize to single-quoted SQL") {
    assert(PetlExpr.compile("""{f} == "it's"""") == """`f` = 'it\'s'""")
  }

  test("arithmetic passes through") {
    assert(PetlExpr.compile("{a} + {b} * 2 > 10 % 3") == "`a` + `b` * 2 > 10 % 3")
  }

  test("out-of-subset constructs are rejected") {
    assertThrows[IllegalArgumentException](PetlExpr.compile("len({a}) > 2"))
    assertThrows[IllegalArgumentException](PetlExpr.compile("{a}.startswith('x')"))
    assertThrows[IllegalArgumentException](PetlExpr.compile("__import__('os')"))
    assertThrows[IllegalArgumentException](PetlExpr.compile("{a} if {b} else {c}"))
  }

  test("fields extraction") {
    assert(PetlExpr.fields("{a} > 1 and {b} == {a}") == Seq("a", "b"))
  }
}
