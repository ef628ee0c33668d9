package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ArrowErrors._

class ArrowErrorsSpec extends AnyFunSuite {

  private def boom(msg: String) = new RuntimeException(msg)

  test("classifies by status substrings like the reference") {
    assert(interpret(boom("ALREADY_EXISTS: graph g")).isInstanceOf[AlreadyExists])
    assert(interpret(boom("INVALID_ARGUMENT: bad entity")).isInstanceOf[InvalidArgument])
    assert(interpret(boom("NOT_FOUND: import x")).isInstanceOf[NotFound])
    assert(interpret(boom("INTERNAL: server died")).isInstanceOf[InternalError])
    assert(interpret(boom("UNKNOWN: who knows")).isInstanceOf[UnknownError])
  }

  test("lowercase 'not found' requires the arrow-process context") {
    assert(interpret(boom("No arrow process for db foo not found"))
      .isInstanceOf[NotFound])
    val passthrough = boom("something not found somewhere")
    assert(interpret(passthrough) eq passthrough)
  }

  test("unmatched exceptions pass through unchanged") {
    val e = boom("plain failure")
    assert(interpret(e) eq e)
  }

  test("UnknownError beautifies to the last line with escapes undone") {
    val raw = "UNKNOWN: gRPC stack\\ntrace line one\\nfinal \\'pretty\\' line"
    val err = interpret(boom(raw)).asInstanceOf[UnknownError]
    assert(err.message == "final 'pretty' line")
  }

  test("classification is case-insensitive on status tokens") {
    assert(interpret(boom("already_exists somewhere")).isInstanceOf[AlreadyExists])
  }
}
