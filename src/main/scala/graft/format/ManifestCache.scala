package graft.format

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.format.GraftFormat.Manifest

/** Process-wide manifest/snapshot cache (SURVEY.md §4; reference analog:
  * the dataset cache keyed (user, path, version) with TTL + invalidation,
  * LanceRuntime.java:149-183 / LanceConfig.java:171-257 and
  * docs/src/performance.md "Caching").
  *
  * Without it every `loadTable` of every query re-lists `_versions` and
  * re-reads + re-parses the latest manifest — on an object store that is
  * two metadata round-trips per query per user.
  *
  * Two tiers:
  *  - `latest`: one entry per table (LRU-bounded by
  *    `spark.graft.manifest.cache.max.entries`, reference analog
  *    `lance.cache.dataset.max_entries`), valid for `ttlMs` since the
  *    last freshness check. On expiry the cache REVALIDATES with a single
  *    version listing; the manifest body is re-read only if the version
  *    actually moved, so even ttl=0 (always revalidate) skips the
  *    read + parse in the common unchanged case. Every local commit
  *    invalidates its table's entry (write path hooks in
  *    [[GraftFormat.commit]]), so same-process readers never see a stale
  *    snapshot regardless of TTL; the TTL only bounds staleness against
  *    commits from OTHER processes. ttl<0 disables the tier.
  *  - `pinned`: (table, version) -> Manifest for time-travel reads.
  *    Committed manifests are immutable, so entries need no TTL — just an
  *    LRU bound. Dropped/vacuumed tables purge their entries so a
  *    re-created table at the same path cannot serve the old generation.
  *
  * Thread-safe; races at worst duplicate a read. Hit/miss counters are
  * exposed for specs (ManifestCacheSpec) and debugging.
  */
object ManifestCache {

  /** Default freshness window, overridable per-session via
    * `spark.graft.manifest.cache.ttl.ms`. */
  val DefaultTtlMs = 1000L

  /** Default latest-tier capacity, overridable per-session via
    * `spark.graft.manifest.cache.max.entries` (reference analog:
    * `lance.cache.dataset.max_entries`, default 100,
    * LanceConfig.java:237-243). A manifest entry here is O(fragments)
    * metadata — far lighter than the reference's dataset handle — so the
    * default is higher, but a long-lived service touching millions of
    * table paths must not grow the driver heap without bound. */
  val DefaultMaxEntries = 1024

  // fileMtime/fileLen identify the manifest FILE, not just its version
  // number: a cross-process drop + re-create restarts version numbers,
  // so a revalidation that compares versions alone would keep serving
  // the dead generation's manifest whenever the new history's head
  // lands on the cached number (in-process drops purge the cache; only
  // another process's drop arrives silently). Both values come from
  // the same listing the revalidation already pays for.
  // bodyReadAtMs: when the manifest BODY was last read from disk —
  // unlike checkedAtMs it is NOT refreshed by stat-only revalidations,
  // because trusting a stat match requires knowing the body itself was
  // read after the file went quiescent (a same-second drop+re-create
  // after the body read leaves an identical stat triple forever; only
  // a post-quiescence body read breaks the ambiguity).
  private final case class Entry(version: Long, manifest: Manifest,
      checkedAtMs: Long, fileMtime: Long, fileLen: Long,
      bodyReadAtMs: Long)

  // Access-ordered LRU bounded by the session cap AND a fragment-weight
  // budget (evictOverweight); all access under `entries.synchronized`
  // (driver-side metadata path, low contention).
  private val entries =
    new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)

  /** Evict eldest-first until `map` satisfies both the entry cap and
    * the fragment-weight budget, never evicting `keep` (the key just
    * inserted — an oversized single manifest must be SERVED, not
    * thrashed). Entry COUNT alone is not a memory bound at 100 TB: one
    * 10⁵-fragment manifest is tens of MB on-heap, so 1024 of them would
    * be tens of GB of driver heap — the weight budget caps total
    * fragment metas across the tier (~1 GB worst case at the default),
    * which no fixed entry count can. O(size) weight sum per insert:
    * puts happen once per manifest READ (metadata path), so the linear
    * walk over ≤cap entries is noise next to the read it follows. */
  private def evictOverweight[V](map: java.util.LinkedHashMap[String, V],
      weightOf: V => Long, cap: Int, budget: Long, keep: String): Unit = {
    var total = 0L
    val vit = map.values().iterator()
    while (vit.hasNext) total += weightOf(vit.next())
    val it = map.entrySet().iterator()
    while ((map.size > cap || total > budget) && it.hasNext) {
      val e = it.next()
      if (e.getKey != keep) {
        total -= weightOf(e.getValue)
        it.remove()
      }
    }
  }

  // Per-table invalidation generation. latest() snapshots it BEFORE its
  // FS reads and only caches the result if no invalidateLatest/purge
  // landed in between — otherwise a local commit racing the read could
  // reinstate the pre-commit manifest with a fresh checkedAtMs and
  // same-process readers would see it for a full TTL. Entries are never
  // removed (a purge-then-recreate reset could revive a stale snapshot
  // of the same generation number); one counter per table path is tiny.
  private val gens = TrieMap.empty[String, AtomicLong]
  private def gen(k: String): AtomicLong =
    gens.getOrElseUpdate(k, new AtomicLong)

  /** Cache `e` only if no invalidation landed since generation `g` was
    * snapshotted — re-checked AFTER the put too, because an
    * invalidateLatest between the pre-check and the put would otherwise
    * reinstate a stale entry through a narrower version of the same
    * race the counter exists to close. */
  private def guardedPut(k: String, g: Long, e: Entry): Unit =
    if (gen(k).get() == g) {
      entries.synchronized {
        entries.put(k, e)
        evictOverweight[Entry](entries, _.manifest.fragments.size.toLong,
          sessionMaxEntries, sessionMaxFragments, k)
      }
      if (gen(k).get() != g) entries.synchronized(entries.remove(k))
    }

  // LRU of immutable (table@version) manifests; access-ordered. Bounded
  // by entry count AND fragment weight (see evictOverweight — a
  // 10⁵-fragment manifest is tens of MB on-heap; 256 of them is not a
  // memory bound). All puts go through pinnedPut.
  private val PinnedCap = 256
  private val pinned =
    new java.util.LinkedHashMap[String, Manifest](64, 0.75f, true)

  private def pinnedPut(k: String, m: Manifest): Unit =
    pinned.synchronized {
      pinned.put(k, m)
      evictOverweight[Manifest](pinned, _.fragments.size.toLong,
        PinnedCap, sessionMaxFragments, k)
    }

  val hits = new AtomicLong
  val revalidations = new AtomicLong
  val misses = new AtomicLong
  val pinnedHits = new AtomicLong
  /** Pinned-tier serves through the cache-only [[peekPinned]] probe (the
    * delta-chain/CDC walks) — counted apart from [[pinnedHits]] so the
    * CDC certification can observe its walk hits without disturbing the
    * readPinned accounting existing specs pin. */
  val peekPinnedHits = new AtomicLong

  // stripSuffix: java.nio `Paths.get(dir).toUri` carries a trailing "/"
  // that Hadoop-built Paths lack; both must key identically
  private def key(fs: FileSystem, table: Path): String =
    fs.makeQualified(table).toUri.toString.stripSuffix("/")

  /** Session conf lookup shared by every tunable here: active session,
    * else default session — planning/async thread pools have no active
    * session, and falling straight through to the hardcoded default
    * would silently ignore a configured value (including ttl=-1 = cache
    * disabled) on those threads — else the hardcoded default. */
  private def sessionConf(key: String, default: Long): Long =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.conf.get(key, default.toString).toLong)
      .getOrElse(default)

  /** Session TTL (see [[sessionConf]] for thread-resolution rules). */
  def sessionTtlMs: Long =
    sessionConf("spark.graft.manifest.cache.ttl.ms", DefaultTtlMs)

  /** Session latest-tier capacity (see [[DefaultMaxEntries]]); resolved
    * on every insert so a reconfigured session shrinks/grows the bound
    * without a restart. Values < 1 are clamped to 1 (the bound exists to
    * cap memory, not to disable the cache — ttl=-1 does that). */
  def sessionMaxEntries: Int =
    // clamp in Long space BOTH ways before narrowing: a huge value
    // (user shorthand for "unbounded") must saturate at Int.MaxValue,
    // not wrap negative and clamp to capacity 1; a below-Int.MinValue
    // value must clamp to 1, not wrap to a large positive capacity
    sessionConf("spark.graft.manifest.cache.max.entries",
      DefaultMaxEntries).max(1L).min(Int.MaxValue.toLong).toInt

  /** Session fragment-weight budget per cache tier (latest AND pinned
    * each): total fragment metas held across a tier's manifests. The
    * default (2²¹ ≈ 2M) is ~20 manifests of a 10⁵-fragment 100 TB
    * table — roughly 1 GB of driver heap worst case — where the entry
    * caps alone would admit 50–100× that. Resolved per insert like
    * [[sessionMaxEntries]]. */
  val DefaultMaxFragments = 1L << 21
  def sessionMaxFragments: Long =
    sessionConf("spark.graft.manifest.cache.max.fragments",
      DefaultMaxFragments).max(1L)

  /** Current latest-tier entry count (spec observability). */
  private[graft] def latestTierSize: Int = entries.synchronized(entries.size)

  /** Current pinned-tier entry count (spec observability). */
  private[graft] def pinnedTierSize: Int = pinned.synchronized(pinned.size)

  /** Current fragment weight per tier (spec observability). */
  private[graft] def latestTierWeight: Long = entries.synchronized {
    var t = 0L
    entries.values().forEach(e => t += e.manifest.fragments.size)
    t
  }
  private[graft] def pinnedTierWeight: Long = pinned.synchronized {
    var t = 0L
    pinned.values().forEach(m => t += m.fragments.size)
    t
  }

  /** The quiescence a cached entry's BODY READ must prove before a
    * matching revalidation stat is trusted: the stat match is
    * conclusive only when `bodyReadAtMs - fileMtime >= quiesceMs` —
    * i.e. the body was read at least this long after the file's mtime,
    * ruling out a same-mtime-second swap landing after the read (see
    * the revalidation branch). NOT a now-based freshness window: `now`
    * never enters the guard. 2 s covers 1-second mtime stores plus
    * clock slop; overridable via
    * `spark.graft.manifest.cache.quiesce.ms` (<= 0 disables the guard
    * entirely — every stat match is trusted). */
  val DefaultQuiesceMs = 2000L
  private def quiesceMs: Long = {
    val v = sessionConf("spark.graft.manifest.cache.quiesce.ms",
      DefaultQuiesceMs)
    // the quiesce proof (a body read >= quiesceMs after mtime rules
    // out a later same-second swap) requires the window to cover the
    // store's mtime granularity — 1 s on object stores. A sub-second
    // positive setting silently cannot deliver that guarantee, so it
    // clamps up; <= 0 stays an explicit opt-out (trust every stat
    // match immediately — the caller accepts the ambiguity).
    if (v <= 0L) v else v.max(1000L)
  }

  /** Latest manifest of `table`, served from cache within `ttlMs` of the
    * last freshness check; revalidated (one version listing) after. */
  def latest(fs: FileSystem, table: Path, ttlMs: Long = sessionTtlMs)
      : Option[Manifest] = {
    if (ttlMs < 0) return GraftFormat.readLatest(fs, table)
    val k = key(fs, table)
    val now = System.currentTimeMillis()
    entries.synchronized(Option(entries.get(k))) match {
      case Some(e) if now - e.checkedAtMs < ttlMs =>
        hits.incrementAndGet()
        Some(e.manifest)
      case cached =>
        val g = gen(k).get()
        GraftFormat.latestVersionStat(fs, table) match {
          case None =>
            entries.synchronized(entries.remove(k))
            None
          case Some((v, mtime, len)) =>
            cached match {
              // (version, mtime, len) equality is conclusive only once
              // the BODY was read from a QUIESCENT file: object stores
              // report mtime at 1-second granularity, and a drop +
              // re-create landing in the same second at the same head
              // version can produce an identical-length manifest
              // (fixed-width UUID, same-digit timestamps). The guard
              // must compare the body-read time against mtime — not
              // `now` — or a swap landing AFTER the body read but
              // inside the same mtime second would pass every later
              // stat check and the dead generation's body would be
              // served forever. A body read >= quiesceMs after mtime
              // proves no later same-second swap exists (a later swap
              // lands in a later second and breaks the stat match).
              // The window costs a few extra body re-reads in the
              // seconds after a commit and nothing in steady state.
              // qMs <= 0 is the explicit opt-out and must short-circuit:
              // bodyReadAtMs (client clock) minus mtime (store clock)
              // can read negative under skew, and relying on `>= 0`
              // would silently re-read bodies on a guard the user
              // disabled
              case Some(e) if e.version == v && e.fileMtime == mtime &&
                  e.fileLen == len && {
                    val qMs = quiesceMs
                    qMs <= 0L || e.bodyReadAtMs - mtime >= qMs
                  } =>
                revalidations.incrementAndGet()
                guardedPut(k, g, e.copy(checkedAtMs = now))
                Some(e.manifest)
              case _ =>
                misses.incrementAndGet()
                // the file the listing saw can vanish before the body
                // read (a racing DROP — vacuum never deletes the head:
                // retention always keeps it): that is the same
                // no-manifest-visible evidence as an empty listing,
                // not an error surfacing from a pure read
                val m =
                  try GraftFormat.readManifest(fs, table, v)
                  catch {
                    case _: java.io.FileNotFoundException =>
                      entries.synchronized(entries.remove(k))
                      return None
                    // a drop + re-create landed INSIDE the delta-chain
                    // walk (the head file read belonged to the dead
                    // generation, a base hop to the new one): the same
                    // no-manifest-visible evidence as the head file
                    // vanishing — the next load reads the new
                    // generation cleanly
                    case _: WrongGeneration =>
                      entries.synchronized(entries.remove(k))
                      return None
                  }
                guardedPut(k, g, Entry(v, m, now, mtime, len,
                  bodyReadAtMs = now))
                Some(m)
            }
        }
    }
  }

  /** Cache-only pinned lookup (NO read on miss): the manifest
    * delta-chain resolver's per-hop probe — it runs INSIDE
    * GraftFormat.readManifest and must not recurse back through
    * [[readPinned]]. A hit is served only when its generation id
    * matches `expectedId` exactly; with no expected id (pre-id
    * manifests) the cache is skipped — the raw read is the safe path. */
  private[format] def peekPinned(fs: FileSystem, table: Path, version: Long,
      expectedId: Option[String]): Option[Manifest] = {
    val k = key(fs, table) + "@" + version
    val served = pinned.synchronized(Option(pinned.get(k))).filter { m =>
      expectedId.exists(id =>
        m.properties.get(GraftFormat.TableIdProp).contains(id))
    }
    if (served.isDefined) peekPinnedHits.incrementAndGet()
    served
  }

  /** Cache-only pinned lookup with NO generation validation — for
    * callers that validate the generation THEMSELVES against evidence
    * read fresh from disk (GraftFormat.sidecarFastPath compares the
    * hit's table id to the just-read sidecar's). Never serve this
    * without such a check: a cross-process drop + re-create leaves
    * stale entries at colliding version numbers. */
  private[format] def peekPinnedRaw(fs: FileSystem, table: Path,
      version: Long): Option[Manifest] = {
    val k = key(fs, table) + "@" + version
    pinned.synchronized(Option(pinned.get(k)))
  }

  /** Evict ONE pinned (table, version) entry — test/bench support: the
    * metadata-scale CDC probe simulates a cross-process reader inside
    * one JVM by dropping the committer's own pin of each new head
    * before the reader syncs it (a real reader in another process never
    * had that pin). Never needed for correctness. */
  private[graft] def unpin(fs: FileSystem, table: Path, version: Long): Unit = {
    val k = key(fs, table) + "@" + version
    pinned.synchronized(pinned.remove(k))
    ()
  }

  /** Pin a manifest a walk already read raw (delta-chain base hops, the
    * provenance walk's checkpoint records) so LATER walks' [[peekPinned]]
    * serves it without re-reading a multi-MB checkpoint per sync.
    * Generation-guarded like [[readPinned]]'s miss path: a purge landing
    * around the put wins. Only id-carrying manifests are pinned —
    * peekPinned never serves id-less entries (the raw read is their safe
    * path), so caching them would only churn the LRU; and a hit is
    * always re-validated against the caller's pinned id, so an entry
    * staled by a drop+re-create can only ever be served back to a walker
    * still pinning ITS generation — exactly the immutable snapshot that
    * walker wants. */
  private[format] def pinPeeked(fs: FileSystem, table: Path, version: Long,
      m: Manifest): Unit = {
    if (!m.properties.contains(GraftFormat.TableIdProp)) return
    val tk = key(fs, table)
    val k = tk + "@" + version
    val g = gen(tk).get()
    pinnedPut(k, m)
    if (gen(tk).get() != g) pinned.synchronized(pinned.remove(k))
  }

  /** Version-pinned manifest (time travel). Immutable once committed, so
    * cached without TTL under an LRU bound. Callers are expected to have
    * checked the version exists (the catalog's VERSION AS OF path lists
    * versions first), keeping cold and warm behavior identical.
    *
    * In-process drops purge this tier, but a CROSS-process drop +
    * re-create arrives silently and restarts version numbers, so a
    * (table, version) key can collide across generations. Every hit is
    * therefore validated against the current generation id: the new
    * history minted a fresh `graft.table_id` (REPLACE inherits the id
    * but CONTINUES version numbering, so its keys never collide), and a
    * mismatch evicts + re-reads. `expectedId` lets callers that already
    * hold a current-generation manifest (the provenance walk's end
    * snapshot) supply the id and skip the `latest()` lookup — with a
    * ttl=0 session that lookup is a listing per call, and the walk is
    * O(versions) calls. Pre-generation-id manifests skip the check
    * (version arithmetic remains their only guard). */
  def readPinned(fs: FileSystem, table: Path, version: Long,
      expectedId: Option[String] = None): Manifest = {
    val tk = key(fs, table)
    val k = tk + "@" + version
    val hit = pinned.synchronized(Option(pinned.get(k)))
    val valid = hit.filter { m =>
      m.properties.get(GraftFormat.TableIdProp) match {
        case None => true // legacy manifest: no identity to compare
        case Some(hid) => expectedId match {
          case Some(want) => want == hid
          case None => latest(fs, table) match {
            // no current generation visible (mid-drop): no evidence
            // against the snapshot — serve it
            case None => true
            // a current generation WITHOUT an id is still a different
            // generation than an id-carrying hit (a pre-generation-id
            // build re-created the table): evict, don't forall-pass
            case Some(cm) =>
              cm.properties.get(GraftFormat.TableIdProp).contains(hid)
          }
        }
      }
    }
    valid match {
      case Some(m) =>
        pinnedHits.incrementAndGet()
        m
      case None =>
        // generation-guarded like the latest tier: a purge landing
        // between this read and the put must win (guardedPut's comment
        // explains the double-check)
        val g = gen(tk).get()
        val m = GraftFormat.readManifest(fs, table, version)
        if (gen(tk).get() == g) {
          pinnedPut(k, m)
          if (gen(tk).get() != g) pinned.synchronized(pinned.remove(k))
        }
        // a caller that PINNED a generation must not receive another
        // one: a drop + re-create landing mid-walk makes the fresh
        // read return the NEW history's manifest at the colliding key.
        // The put above stands (it IS current for future callers); the
        // pinned caller gets the typed signal instead of silently
        // mixing generations into its exclusion arithmetic.
        for {
          want <- expectedId
          got <- m.properties.get(GraftFormat.TableIdProp)
          if got != want
        } throw WrongGeneration(table, version, want, Some(got))
        m
    }
  }

  /** A version-pinned read returned a manifest from a DIFFERENT
    * generation than the caller pinned (cross-process drop + re-create
    * landed mid-walk and version numbers collided). Callers map this to
    * their lost-history policy, like [[GraftFormat.LostHistoryDuringWalk]]. */
  final case class WrongGeneration(table: Path, version: Long,
      want: String, got: Option[String]) extends RuntimeException(
    s"manifest $version of $table belongs to generation " +
      s"${got.getOrElse("<none>")}, not the pinned generation $want: " +
      "the table was dropped and re-created during the read")

  /** A new version landed locally: drop the latest-tier entry (next load
    * re-reads). Pinned entries stay — committed versions are immutable. */
  def invalidateLatest(fs: FileSystem, table: Path): Unit = {
    val k = key(fs, table)
    gen(k).incrementAndGet()
    entries.synchronized(entries.remove(k))
  }

  /** The table was dropped, replaced, or vacuumed: purge everything for
    * the path, including pinned versions (a re-created table at the same
    * path must not serve the previous generation's manifests). */
  def purge(fs: FileSystem, table: Path): Unit = {
    val k = key(fs, table)
    gen(k).incrementAndGet()
    entries.synchronized(entries.remove(k))
    pinned.synchronized {
      val it = pinned.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(k + "@")) it.remove()
    }
    // index segment-list resolutions live under the table path and die
    // with the same events (drop/replace/vacuum)
    graft.ops.IndexSegments.invalidateUnder(fs, table)
  }

  /** DROP NAMESPACE: every table under `dir` dies — including tables
    * this process never listed (created concurrently with the drop, so
    * absent from the caller's captured per-table purge list). Evicts
    * both tiers for every key under the prefix and bumps each affected
    * table's OWN generation so an in-flight latest() cannot re-cache.
    * Boundary-safe: namespace '/wh/db' must not touch sibling
    * '/wh/db2' (same lesson as IndexSegments.invalidateUnder). */
  def purgeUnder(fs: FileSystem, dir: Path): Unit = {
    val p = key(fs, dir) + "/"
    // bump generations FIRST: a latest() racing this sweep fails its
    // generation-guarded put; evicting before bumping would leave a
    // window where the in-flight read re-caches the dead entry
    gens.foreach { case (k, g) => if (k.startsWith(p)) g.incrementAndGet() }
    entries.synchronized {
      val it = entries.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(p)) it.remove()
    }
    pinned.synchronized {
      val it = pinned.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(p)) it.remove()
    }
    graft.ops.IndexSegments.invalidateUnder(fs, dir)
  }

  def clearAll(): Unit = {
    // bump every known generation FIRST: a latest() in flight must not
    // guardedPut its pre-clear entry back after the clear
    gens.values.foreach(_.incrementAndGet())
    entries.synchronized(entries.clear())
    pinned.synchronized(pinned.clear())
    // same lifecycle symmetry as the purge hook: a full reset must not
    // leave stale segment-list resolutions behind
    graft.ops.IndexSegments.clearCache()
  }
}
