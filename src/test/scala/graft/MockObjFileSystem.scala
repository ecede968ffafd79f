package graft

import org.apache.hadoop.fs.Path

/** Test double for an OBJECT-STORE filesystem: a local filesystem
  * whose rename REPLACES an existing destination silently (the
  * copy+delete semantics that make s3/gs/abfs unsound for the
  * manifest CAS). Registered under scheme `mockobj` via
  * `fs.mockobj.impl`, it lets ManifestSpec prove both halves of the
  * r18 CommitProtocol contract: default-DENY without a registered
  * protocol, and a conforming conditional-put protocol restoring the
  * CAS-loser-must-fail law on a store that natively breaks it. */
class MockObjFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockobj"
  override def getUri: java.net.URI = java.net.URI.create("mockobj:///")
  override def rename(src: Path, dst: Path): Boolean = {
    // object-store "rename": last writer wins, no fail-on-existing
    if (exists(dst)) delete(dst, false): Unit
    super.rename(src, dst)
  }
}
