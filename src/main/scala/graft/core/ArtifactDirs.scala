package graft.core

/** The ONE landing-dir derivation for per-dataset landed artifacts
  * (q78 jsonl shards, q81 IVF-PQ index, q97 benchmark gram set, q98
  * epoch manifests): `tmpdir/<prefix>_<user>_<md5-4B(dataDir)>`.
  * Keyed by (user, source data dir) so concurrent runs over different
  * datasets never clobber each other's artifact, and runs by
  * different users on a shared tmpdir never collide. Centralized
  * because the four artifact owners must stay collision-consistent:
  * a sanitization or tag-width change applied to one but not the
  * others would silently repoint oracles at stale dirs. */
object ArtifactDirs {
  def dirFor(prefix: String, dataDir: String): String = {
    val user = sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9_-]", "_")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/${prefix}_${user}_$tag"
  }
}
