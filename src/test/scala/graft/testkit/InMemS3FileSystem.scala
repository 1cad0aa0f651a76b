package graft.testkit

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-JVM S3 stub at the Hadoop FileSystem layer — the seam the real
  * `S3AFileSystem` plugs into. Registering it as the `s3a` scheme
  * (`fs.s3a.impl` = this class) lets specs drive LakeIO / Bronze /
  * IngestFlow / parquet read+write against `s3a://bucket/...` URIs with
  * OBJECT-STORE semantics, not POSIX ones:
  *
  *  - a flat key→object map per bucket (no inodes; "directories" exist
  *    only as key prefixes, plus explicit markers for `mkdirs`);
  *  - PUT visibility on close (an object appears atomically when the
  *    writer closes, never as a partial file);
  *  - `rename` is per-object copy+delete over a prefix, exactly the
  *    shape S3A gives `FileOutputCommitter`'s `_temporary` promotion;
  *  - per-object modification times (what LakeIO's most-recent-file
  *    resolution sorts on).
  *
  * The container has no hadoop-aws/MinIO (zero egress), so this is the
  * strongest available proof that the lake layer is
  * Hadoop-FileSystem-generic; against real S3 only the conf line
  * changes. The store is JVM-global ([[InMemS3FileSystem.clear]] resets)
  * because Hadoop instantiates one FileSystem per (scheme, authority).
  */
class InMemS3FileSystem extends FileSystem {

  import InMemS3FileSystem.Obj

  private var fsUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    setConf(conf)
  }

  override def getScheme: String = "s3a"
  override def getUri: URI = fsUri

  private def bucket: TrieMap[String, Obj] =
    InMemS3FileSystem.buckets.getOrElseUpdate(fsUri.getAuthority, TrieMap.empty)
  private def markers: TrieMap[String, Unit] =
    InMemS3FileSystem.dirMarkers.getOrElseUpdate(fsUri.getAuthority, TrieMap.empty)

  /** Bucket-relative key ("" = bucket root). */
  private def key(p: Path): String =
    makeQualified(p).toUri.getPath.stripPrefix("/").stripSuffix("/")

  private def isImplicitDir(k: String): Boolean =
    k.isEmpty || markers.contains(k) ||
      bucket.keysIterator.exists(_.startsWith(k + "/")) ||
      markers.keysIterator.exists(_.startsWith(k + "/"))

  private def fileStatus(p: Path, k: String): FileStatus =
    bucket.get(k) match {
      case Some(o) => new FileStatus(o.bytes.length.toLong, false, 1,
        32L * 1024 * 1024, o.mtime, makeQualified(p))
      case None if isImplicitDir(k) =>
        new FileStatus(0L, true, 1, 32L * 1024 * 1024, 0L, makeQualified(p))
      case None => throw new FileNotFoundException(s"s3a stub: no such key $k")
    }

  override def getFileStatus(f: Path): FileStatus = fileStatus(f, key(f))

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val o = bucket.getOrElse(key(f),
      throw new FileNotFoundException(s"s3a stub: no such key ${key(f)}"))
    new FSDataInputStream(new SeekableBytes(o.bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && bucket.contains(k))
      throw new FileAlreadyExistsException(s"s3a stub: $k exists")
    if (isImplicitDir(k) && !bucket.contains(k))
      if (markers.contains(k) || bucket.keysIterator.exists(_.startsWith(k + "/")))
        throw new FileAlreadyExistsException(s"s3a stub: $k is a directory")
    val buf = new ByteArrayOutputStream()
    // PUT semantics: the object materializes atomically on close
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        super.close()
        bucket(k) = Obj(buf.toByteArray, System.currentTimeMillis())
        markers.remove(k)
      }
    }, statistics)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("s3a stub: append (S3 cannot)")

  override def rename(src: Path, dst: Path): Boolean = {
    val srcK = key(src)
    val dstK0 = key(dst)
    if (srcK == dstK0) return true
    // Hadoop semantics: renaming INTO an existing directory nests under it
    val dstK = if (isImplicitDir(dstK0) && !bucket.contains(dstK0))
      (if (dstK0.isEmpty) src.getName else s"$dstK0/${src.getName}")
    else dstK0
    if (bucket.contains(srcK)) { // single object: copy + delete
      bucket(dstK) = bucket.remove(srcK).get
      true
    } else if (isImplicitDir(srcK)) { // prefix: per-object copy + delete
      val prefix = srcK + "/"
      val keys = bucket.keysIterator.filter(_.startsWith(prefix)).toSeq
      keys.foreach { k => bucket(s"$dstK/${k.stripPrefix(prefix)}") = bucket.remove(k).get }
      val mks = markers.keysIterator.filter(_.startsWith(prefix)).toSeq
      mks.foreach { k => markers(s"$dstK/${k.stripPrefix(prefix)}") = (); markers.remove(k) }
      markers.remove(srcK)
      markers(dstK) = () // destination dir exists even if src was empty
      true
    } else false
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (bucket.remove(k).isDefined) true
    else if (isImplicitDir(k)) {
      val prefix = k + "/"
      val children = bucket.keysIterator.exists(_.startsWith(prefix)) ||
        markers.keysIterator.exists(_.startsWith(prefix))
      if (children && !recursive)
        throw new IOException(s"s3a stub: $k is a non-empty directory")
      bucket.keysIterator.filter(_.startsWith(prefix)).toSeq.foreach(bucket.remove)
      markers.keysIterator.filter(_.startsWith(prefix)).toSeq.foreach(markers.remove)
      markers.remove(k)
      true
    } else false
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (bucket.contains(k)) return Array(fileStatus(f, k))
    if (!isImplicitDir(k))
      throw new FileNotFoundException(s"s3a stub: no such key $k")
    val prefix = if (k.isEmpty) "" else k + "/"
    val names = (bucket.keysIterator ++ markers.keysIterator)
      .filter(x => x.startsWith(prefix) && x.length > prefix.length)
      .map(_.stripPrefix(prefix).split('/').head).toSet
    names.toArray.sorted.map { n =>
      val child = new Path(makeQualified(f), n)
      fileStatus(child, if (prefix.isEmpty) n else s"$prefix$n")
    }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    var k = key(f)
    while (k.nonEmpty && !bucket.contains(k)) { markers(k) = (); k = k.split('/').dropRight(1).mkString("/") }
    true
  }

  private var workDir = new Path("/")
  override def setWorkingDirectory(d: Path): Unit = workDir = d
  override def getWorkingDirectory: Path = workDir

  /** Seekable, position-readable byte array — what parquet footers need. */
  private final class SeekableBytes(bytes: Array[Byte]) extends FSInputStream {
    private val in = new ByteArrayInputStream(bytes)
    private var pos = 0L
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek $p")
      in.reset(); in.skip(p); pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = in.read(b, off, len); if (n > 0) pos += n; n
    }
    override def available(): Int = in.available()
  }
}

object InMemS3FileSystem {
  final case class Obj(bytes: Array[Byte], mtime: Long)
  private[testkit] val buckets = TrieMap[String, TrieMap[String, Obj]]()
  private[testkit] val dirMarkers = TrieMap[String, TrieMap[String, Unit]]()

  /** Reset every bucket (test isolation). */
  def clear(): Unit = { buckets.clear(); dirMarkers.clear() }
}
