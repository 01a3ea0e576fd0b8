package graft

import org.scalatest.funsuite.AnyFunSuite

class TempDirsSpec extends AnyFunSuite {

  test("a throwing build leaves a FAILED staging record and a retry rebuilds fresh") {
    val key = s"tdfail:${System.nanoTime()}"
    val boom = intercept[RuntimeException] {
      TempDirs.cached(key) { _ => throw new RuntimeException("staged build exploded") }
    }
    assert(boom.getMessage.contains("exploded"))
    // the failed attempt's cost must be visible in the staging map under
    // a per-artifact FAILED prefix — not swallowed, not lumped into one
    // undifferentiated FAILED bucket
    assert(TempDirs.stagingSeconds.contains("FAILED:tdfail"),
      s"failed build left no staging record: ${TempDirs.stagingSeconds.keys}")
    // a second attempt is NOT poisoned by the failure: it rebuilds into
    // a fresh dir, succeeds, and caches
    var builtInto: String = null
    val dir = TempDirs.cached(key) { d =>
      builtInto = d
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "ok"), "x".getBytes("UTF-8"))
    }
    assert(dir == builtInto)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "ok")))
    assert(TempDirs.stagingSeconds.contains("tdfail"))
    // and a third call is a cache hit (no rebuild)
    var rebuilt = false
    val again = TempDirs.cached(key) { _ => rebuilt = true }
    assert(again == dir && !rebuilt)
  }
}
