package graft.index

import graft.SparkSpecBase

/** Marker-IO semantics of the Fs seam — specifically the no-FileContext
  * fallback path of writeAtomic (schemes without an AbstractFileSystem
  * binding, e.g. some object stores), faked via Fs.forceNoFileContext.
  */
class FsSpec extends SparkSpecBase {

  test("writeAtomic fallback (no FileContext) is WRITE-ONCE for same-content rewrites") {
    val dir = tmpDir("graft-fs-atomic")
    val p = s"$dir/index_meta.json"
    Fs.forceNoFileContext = true
    try {
      Fs.writeAtomic(p, "content-a")
      assert(Fs.readString(p) == "content-a")
      val before = Fs.fallbackPreDeletes.get()
      // idempotent replay (a re-delivered streaming batch re-writing an
      // identical generation meta; a resumed stage re-writing its
      // manifest): must NOT delete-then-rename — that opens a window in
      // which a concurrent genDirs/readMeta sees a COMPLETE generation
      // as absent (round-4 verdict #7)
      Fs.writeAtomic(p, "content-a")
      assert(Fs.fallbackPreDeletes.get() == before,
        "same-content rewrite opened a delete->rename window")
      assert(Fs.readString(p) == "content-a")
      assert(!Fs.exists(s"$p.tmp"), "tmp file must be cleaned up on the skip path")
      // a genuinely different marker still replaces (and pays the
      // window — the best any rename-commit protocol has on such
      // schemes; a crash mid-gap leaves the marker ABSENT, the safe
      // direction: absent = redo the idempotent step)
      Fs.writeAtomic(p, "content-b")
      assert(Fs.fallbackPreDeletes.get() == before + 1)
      assert(Fs.readString(p) == "content-b")
    } finally Fs.forceNoFileContext = false
  }

  test("writeAtomic FileContext path replaces in place (no fallback delete)") {
    val dir = tmpDir("graft-fs-fc")
    val p = s"$dir/marker.json"
    val before = Fs.fallbackPreDeletes.get()
    Fs.writeAtomic(p, "a")
    Fs.writeAtomic(p, "b") // OVERWRITE rename: atomic replace, no window
    assert(Fs.readString(p) == "b")
    assert(Fs.fallbackPreDeletes.get() == before)
  }
}
