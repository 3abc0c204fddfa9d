package graft.sources

/** Shared on-disk artifact root for every build-once/read-many output
  * (IVF-PQ indexes, partitioned/bucketed layouts): `GRAFT_INDEX_DIR` or
  * `<tmp>/graft-index`. ONE definition — indexes and layouts must never
  * silently land in different roots when the convention changes. */
object Artifacts {
  def cacheDir: String =
    sys.env.getOrElse("GRAFT_INDEX_DIR",
      sys.props("java.io.tmpdir") + "/graft-index")
}
