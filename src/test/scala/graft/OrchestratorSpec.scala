package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Orchestrator
import graft.pipeline.Orchestrator.{Failed, Skipped, Succeeded, Task}

class OrchestratorSpec extends AnyFunSuite {

  test("tasks run in dependency order") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val status = Orchestrator.run(Seq(
      Task("t3", Seq("t2"))(() => log += "t3"),
      Task("t1")(() => log += "t1"),
      Task("t2", Seq("t1"))(() => log += "t2")))
    assert(log.toSeq == Seq("t1", "t2", "t3"))
    assert(status.values.forall(_ == Succeeded(1)))
  }

  test("a task failing fewer times than its retry budget succeeds") {
    var calls = 0
    val status = Orchestrator.run(Seq(
      Task("flaky", Nil, retries = 2) { () =>
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
      }))
    assert(status("flaky") == Succeeded(3))
    assert(calls == 3)
  }

  test("a task exhausting retries fails and downstream is skipped, independent branches run") {
    var ran = Set.empty[String]
    val status = Orchestrator.run(Seq(
      Task("bad", Nil, retries = 1)(() => throw new RuntimeException("boom")),
      Task("child", Seq("bad"))(() => ran += "child"),
      Task("grandchild", Seq("child"))(() => ran += "grandchild"),
      Task("other", Nil)(() => ran += "other")))
    assert(status("bad").isInstanceOf[Failed])
    assert(status("bad").attempts == 2)
    assert(status("child") == Skipped("bad"))
    assert(status("grandchild") == Skipped("child"))
    assert(status("other") == Succeeded(1))
    assert(ran == Set("other"))
  }

  test("cycles and unknown dependencies are rejected") {
    intercept[IllegalArgumentException] {
      Orchestrator.run(Seq(
        Task("a", Seq("b"))(() => ()), Task("b", Seq("a"))(() => ())))
    }
    intercept[IllegalArgumentException] {
      Orchestrator.run(Seq(Task("a", Seq("nope"))(() => ())))
    }
  }
}
