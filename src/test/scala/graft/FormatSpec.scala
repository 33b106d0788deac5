package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Format

/** Behavioral parity with the reference formatter
  * (/root/reference/src/table/scan.rs:7-34). */
class FormatSpec extends AnyFunSuite {

  test("plain sig-fig formatting trims zeros and dot") {
    assert(Format.formatCurrency(1234.5678f, 5) == "1234.6")
    assert(Format.formatCurrency(0.5f, 5) == "0.5")
    assert(Format.formatCurrency(12.30f, 5) == "12.3")
    assert(Format.formatCurrency(7f, 5) == "7")
  }

  test("scientific fallback above 10^sigFigs") {
    assert(Format.formatCurrency(123456f, 5) == "1.2e5")
  }

  test("small values keep at least one decimal") {
    assert(Format.formatCurrency(99999f, 5) == "99999")
  }
}
