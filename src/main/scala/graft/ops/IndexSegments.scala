package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.format.GraftFormat

/** Segmented (merge-on-read) layout shared by every persisted index —
  * the machinery behind incremental refresh-on-append (reference
  * analog: Lance's automatic index updates over newly-written
  * fragments, docs/src/performance.md "Index Usage"; Lance likewise
  * keeps the trained index and covers appended fragments with delta
  * structures rather than retraining).
  *
  * A freshly BUILT index stays monolithic: `v=<V>/` holds the payload
  * directly (postings/, assign/, codes/, bucket=*). A REFRESHED index
  * writes only the delta: a root-level `seg-<uuid>/` directory holding
  * the same payload shape for the appended fragments, plus a
  * `v=<V2>/_segments.json` manifest listing, relative to the index
  * root, every directory whose payloads make up version V2 — the prior
  * version's directories (expanded, never nested) and the new delta
  * segment. Readers resolve a version to its data-directory list and
  * union payloads; refresh cost is O(appended data + index metadata),
  * never O(corpus).
  *
  * Vacuum contract: an index directory (monolithic `v=<N>` or
  * `seg-*`) stays alive while ANY retained version's manifest
  * references it, even after version N's table manifest is dropped —
  * [[referencedDirs]] computes that live set for Maintenance.vacuum.
  */
object IndexSegments {

  val ManifestName = "_segments.json"
  private val mapper = new ObjectMapper()

  // Resolved version -> data-directory lists, process-wide. A version
  // dir's manifest state is fixed once the dir exists (refresh writes
  // manifests only into NEW v=<V> dirs), so entries need no TTL — only
  // invalidation on table drop/replace/vacuum (hooked from
  // ManifestCache.purge) and on write (idempotency). Without this every
  // index-backed query re-probes _segments.json — an exists + read +
  // parse per index per query, two object-store round trips at scale.
  private val resolvedCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]
  val cacheHits = new java.util.concurrent.atomic.AtomicLong()
  val cacheMisses = new java.util.concurrent.atomic.AtomicLong()
  // TOCTOU guard (same pattern as ManifestCache's per-table gens): a
  // dataDirs racing drop/vacuum between the purge and the fs.delete
  // could otherwise re-cache the dying generation's segment list — and
  // a later monolithic build() at the same version dir writes no
  // segment manifest, so nothing would ever invalidate it. Resolutions
  // only cache when their table's generation did not move mid-read; a
  // lost race costs one re-read, and churn on OTHER tables never
  // suppresses caching here (per-table counters, never removed — a
  // remove-then-recreate reset could revive a dead generation).
  private val gens = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]
  private def gen(tableKey: String): java.util.concurrent.atomic.AtomicLong =
    gens.getOrElseUpdate(tableKey, new java.util.concurrent.atomic.AtomicLong)

  private def cacheKey(fs: FileSystem, versionDir: Path): String =
    s"${fs.getUri}::${versionDir.toUri.getPath}"

  /** The owning table's generation key for an index root
    * (…/table/_indices/col.kind → …/table). */
  private def tableKeyOf(fs: FileSystem, indexRoot: Path): String = {
    val table = Option(indexRoot.getParent).flatMap(p => Option(p.getParent))
      .getOrElse(indexRoot)
    s"${fs.getUri}::${table.toUri.getPath}"
  }

  /** Drop cached resolutions for every index version dir under `table`
    * on this FileSystem — the table was dropped, replaced, or vacuumed.
    * Call BEFORE deleting (so readers stop serving the old generation)
    * and AFTER (so a resolution that started in between cannot re-cache
    * the dying generation: its cached entry is removed and its gen
    * snapshot is stale). */
  def invalidateUnder(fs: FileSystem, table: Path): Unit = {
    // bump the exact key AND every existing generation key under the
    // path: when `table` is a NAMESPACE directory (dropNamespace's
    // sweep), an in-flight dataDirs for a child table snapshotted the
    // TABLE-path generation — bumping only the namespace key would let
    // that resolution finish after the sweep, see its own key
    // unmoved, and re-cache the dead generation's segment list
    // (TTL-less, so it would be served until some other lifecycle
    // event happened to bump that exact key).
    val exact = s"${fs.getUri}::${table.toUri.getPath}"
    gen(exact).incrementAndGet()
    // match on a path-separator boundary: cache keys under `table`
    // always continue with "/_indices/...", and a bare startsWith would
    // also evict every sibling whose name extends the prefix (table
    // "t" evicting "t2" — over-invalidation that silently defeats the
    // cache for same-prefix table names under churn)
    val prefix = s"$exact/"
    gens.keys.foreach { k =>
      if (k.startsWith(prefix)) gen(k).incrementAndGet()
    }
    resolvedCache.keys.foreach { k =>
      if (k.startsWith(prefix)) resolvedCache.remove(k)
    }
  }

  /** Test-only: the TOCTOU generation counter for a table path. Lets
    * specs assert lifecycle events bump the generation an in-flight
    * dataDirs actually snapshots (the TABLE key, not an ancestor's). */
  private[graft] def generationOf(fs: FileSystem, table: Path): Long =
    gen(s"${fs.getUri}::${table.toUri.getPath}").get()

  /** Drop the cached resolution of ONE version dir — a rebuild at this
    * dir deleted/replaced its segment manifest. */
  def invalidateDir(fs: FileSystem, versionDir: Path): Unit =
    resolvedCache.remove(cacheKey(fs, versionDir))

  def clearCache(): Unit = {
    gens.values.foreach(_.incrementAndGet())
    resolvedCache.clear()
  }

  final case class SegManifest(segments: Seq[String], extra: Map[String, String])

  def manifestPath(versionDir: Path): Path = new Path(versionDir, ManifestName)

  def newSegmentName(): String = s"seg-${java.util.UUID.randomUUID()}"

  def write(fs: FileSystem, versionDir: Path, m: SegManifest): Unit = {
    val node = mapper.createObjectNode()
    val arr = node.putArray("segments")
    m.segments.foreach(arr.add)
    val ex = node.putObject("extra")
    m.extra.toSeq.sortBy(_._1).foreach { case (k, v) => ex.put(k, v) }
    fs.mkdirs(versionDir)
    val out = fs.create(manifestPath(versionDir), true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    resolvedCache.remove(cacheKey(fs, versionDir))
  }

  def read(fs: FileSystem, versionDir: Path): Option[SegManifest] = {
    val p = manifestPath(versionDir)
    if (!fs.exists(p)) return None
    val node = mapper.readTree(GraftFormat.readBytes(fs, p))
    val segs = Seq.newBuilder[String]
    node.get("segments").forEach(s => segs += s.asText())
    val extra = Map.newBuilder[String, String]
    val ex = node.get("extra")
    if (ex != null) ex.properties().forEach(e => extra += e.getKey -> e.getValue.asText())
    Some(SegManifest(segs.result(), extra.result()))
  }

  /** The data directories whose payloads make up the index at
    * `versionDir`: the listed segments when a manifest exists (resolved
    * against `indexRoot`, recursively in case a manifest ever lists a
    * manifest-bearing version dir), else the version dir itself.
    * Returns Nil when the version dir does not exist. */
  def dataDirs(fs: FileSystem, indexRoot: Path, versionDir: Path): Seq[Path] = {
    val ck = cacheKey(fs, versionDir)
    resolvedCache.get(ck) match {
      case Some(dirs) =>
        cacheHits.incrementAndGet()
        return dirs.map(new Path(_))
      case None => cacheMisses.incrementAndGet()
    }
    val tk = tableKeyOf(fs, indexRoot)
    val genAtStart = gen(tk).get()
    if (!fs.exists(versionDir)) return Seq.empty // absent: may appear later, never cached
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    def walk(dir: Path): Unit = read(fs, dir) match {
      case Some(m) => m.segments.foreach { rel =>
        val d = new Path(indexRoot, rel)
        if (!seen.contains(d.toString)) walk(d)
      }
      case None => seen += dir.toString
    }
    walk(versionDir)
    val out = seen.toSeq
    if (gen(tk).get() == genAtStart) {
      resolvedCache.put(ck, out)
      // an invalidation may land between the check and the put; re-check
      // and withdraw rather than serve a dying generation for ever
      if (gen(tk).get() != genAtStart) resolvedCache.remove(ck)
    }
    out.map(new Path(_))
  }

  /** The segment list a NEW manifest should carry to cover everything
    * `priorVersionDir` covers: its manifest's segments when present
    * (expansion keeps chains flat), else the prior dir itself. */
  def expandPrior(fs: FileSystem, indexRoot: Path, priorVersionDir: Path): Seq[String] =
    read(fs, priorVersionDir) match {
      case Some(m) => m.segments
      case None => Seq(priorVersionDir.getName)
    }

  /** Index-root-relative names of every directory referenced by the
    * given version dirs' manifests (transitively) — the set vacuum must
    * NOT delete even when the referenced version itself is dropped. */
  def referencedDirs(fs: FileSystem, indexRoot: Path,
      versionDirs: Seq[Path]): Set[String] = {
    val out = scala.collection.mutable.HashSet.empty[String]
    def walk(dir: Path): Unit = read(fs, dir).foreach(_.segments.foreach { rel =>
      if (out.add(rel)) walk(new Path(indexRoot, rel))
    })
    versionDirs.foreach(walk)
    out.toSet
  }
}
