package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{S3LiteFileSystem, S3LiteServer}

/** Property test for ListObjectsV2 pagination over the wire: for ANY
  * key set, page size, and listing depth, a paged delimiter listing
  * must equal the flat model — every file exactly once, every common
  * prefix exactly once, nothing skipped at page boundaries. Pins the
  * round-11 token scheme (typed gt:/ge: resume tokens) against the two
  * bugs it replaced: duplicate CommonPrefixes when truncation lands
  * mid-group, and a skipped object whose key equals a group's computed
  * resume bound ('a/...' group vs object 'a0'). */
class S3ListingPropertySpec extends AnyFunSuite {

  private lazy val srv = S3LiteServer.shared
  private val trial = new AtomicInteger()

  private def fsFor(bucket: String, pageSize: Int): FileSystem = {
    val conf = new Configuration()
    conf.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
    conf.set(S3LiteFileSystem.EndpointKey, srv.endpoint)
    conf.setInt(S3LiteFileSystem.ListPageSizeKey, pageSize)
    conf.setBoolean("fs.s3a.impl.disable.cache", true)
    new Path(s"s3a://$bucket/").getFileSystem(conf)
  }

  test("paged delimiter listing equals the flat model for random key sets") {
    // segments chosen so groups collide and keys straddle group resume
    // bounds: 'a0' sorts immediately after the whole 'a/...' group
    val seg = Gen.oneOf("a", "b", "a0", "ab", "b0", "z", "k1", "k2")
    val genKey = for {
      n <- Gen.choose(1, 3)
      parts <- Gen.listOfN(n, seg)
    } yield parts.mkString("/")
    // drop keys that are a segment-prefix of another ("a" vs "a/b"):
    // a name that is both file and directory is ambiguous on object
    // stores and out of scope for the paging model under test
    val genKeys = Gen.nonEmptyListOf(genKey).map(_.distinct)
      .map(ks => ks.filterNot(k => ks.exists(o => o != k && o.startsWith(k + "/"))))
      .suchThat(_.nonEmpty)
    val genPage = Gen.choose(1, 6)

    val prop = Prop.forAll(genKeys, genPage) { (keys, page) =>
      val bucket = s"proplist${trial.incrementAndGet()}"
      val fs = fsFor(bucket, page)
      try {
        keys.foreach { k =>
          val out = fs.create(new Path(s"s3a://$bucket/$k"), true)
          try out.write('x') finally out.close()
        }
        // model + actual at every directory level present in the keys
        val levels = ("" +: keys.flatMap { k =>
          val parts = k.split('/')
          (1 until parts.length).map(i => parts.take(i).mkString("/"))
        }).distinct
        levels.forall { lvl =>
          val pre = if (lvl.isEmpty) "" else lvl + "/"
          val expFiles = keys.filter(k =>
            k.startsWith(pre) && !k.drop(pre.length).contains('/'))
            .map(_.drop(pre.length)).toSet
          val expDirs = keys.filter(k =>
            k.startsWith(pre) && k.drop(pre.length).contains('/'))
            .map(_.drop(pre.length).takeWhile(_ != '/')).toSet
          val st = fs.listStatus(new Path(s"s3a://$bucket/$lvl"))
          val files = st.filter(!_.isDirectory).map(_.getPath.getName).toSet
          val dirs = st.filter(_.isDirectory).map(_.getPath.getName).toSet
          val dup = st.map(_.getPath.getName).groupBy(identity)
            .exists(_._2.length > 1)
          files == expFiles && dirs == expDirs && !dup
        }
      } finally fs.delete(new Path(s"s3a://$bucket/"), true)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, s"listing model violated: ${res.status}")
  }
}
