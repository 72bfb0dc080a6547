package graft.sinks

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, InputStream}
import java.net.URI
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-memory blob store backing the two conformance-kit filesystems
  * ([[MemHdfsFileSystem]], [[MemObjectStoreFileSystem]]). One flat
  * key→bytes map per bucket (URI authority) — the object-store data
  * model: no inodes, directories are implicit prefixes.
  *
  * Everything here exists so a conditional-put seam can PROVE itself
  * (see [[ConditionalPutContract]]) without a real cluster: the store's
  * `putIfAbsent` is the If-None-Match:* PUT primitive (S3 conditional
  * writes, GCS `ifGenerationMatch 0`, Azure `If-None-Match: *`), and the
  * two filesystems model the two rename contracts `ManifestSink
  * .tryPublishNew` dispatches between. */
object MemBlobStore {
  private val buckets =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Array[Byte]]]()
  /** Explicitly-created directories (mkdirs) per bucket, so an empty
    * directory round-trips through getFileStatus/listStatus. */
  private val dirs = new ConcurrentHashMap[String, java.util.Set[String]]()

  def bucket(name: String): ConcurrentHashMap[String, Array[Byte]] =
    buckets.computeIfAbsent(name, _ => new ConcurrentHashMap())
  def dirSet(name: String): java.util.Set[String] =
    dirs.computeIfAbsent(name, _ => ConcurrentHashMap.newKeySet[String]())
  /** Drop a bucket (test isolation). */
  def clear(name: String): Unit = { buckets.remove(name); dirs.remove(name) }

  /** The reference conditional put: atomically publish iff the key does
    * not exist — exactly the semantics a real object-store seam maps to
    * an `If-None-Match: *` PUT (HTTP 412 → false). Suitable for
    * `ManifestSink.registerConditionalPut("mos", MemBlobStore
    * .ifNoneMatchPut)`. */
  def ifNoneMatchPut: (FileSystem, Path, String) => Boolean = (_, p, content) => {
    val u = p.toUri
    bucket(Option(u.getAuthority).getOrElse(""))
      .putIfAbsent(u.getPath, content.getBytes(StandardCharsets.UTF_8)) == null
  }
}

/** Shared plumbing for the two in-memory filesystems: flat key space,
  * implicit directories, byte-array streams. Only what the conformance
  * kit drives is implemented — `append` and directory rename throw. */
abstract class MemFileSystemBase extends FileSystem {
  private var myUri: URI = _
  private var workDir: Path = _

  protected def store: ConcurrentHashMap[String, Array[Byte]] =
    MemBlobStore.bucket(Option(myUri.getAuthority).getOrElse(""))
  protected def explicitDirs: java.util.Set[String] =
    MemBlobStore.dirSet(Option(myUri.getAuthority).getOrElse(""))
  protected def key(f: Path): String = {
    val k = f.toUri.getPath
    if (k.length > 1 && k.endsWith("/")) k.dropRight(1) else k
  }

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    myUri = URI.create(s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
    workDir = new Path(myUri.toString + "/")
    setConf(conf)
  }
  override def getUri: URI = myUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(d: Path): Unit = { workDir = d }
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    var p = f
    while (p != null && p.toUri.getPath.nonEmpty) {
      explicitDirs.add(key(p)); p = p.getParent
    }
    true
  }

  private class SeekableBytes(bytes: Array[Byte]) extends InputStream
      with Seekable with PositionedReadable {
    private val in = new ByteArrayInputStream(bytes)
    private var pos = 0L
    override def read(): Int = { val r = in.read(); if (r >= 0) pos += 1; r }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(b, off, len); if (r > 0) pos += r; r
    }
    override def seek(newPos: Long): Unit = {
      in.reset(); in.skip(newPos); pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException()
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = store.get(key(f))
    if (bytes == null) throw new FileNotFoundException(f.toString)
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && store.containsKey(key(f)))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    val buf = new ByteArrayOutputStream()
    val k = key(f)
    val s = store
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = { super.close(); s.put(k, buf.toByteArray) }
    }, null)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append: not in the kit's scope")

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val removedFile = store.remove(k) != null
    val prefix = if (k == "/") "/" else k + "/"
    val children = new java.util.ArrayList[String]()
    store.keySet().forEach(c => if (c.startsWith(prefix)) children.add(c))
    if (!children.isEmpty && !recursive)
      throw new java.io.IOException(s"non-recursive delete of non-empty $f")
    children.forEach(c => store.remove(c))
    val removedDirs = new java.util.ArrayList[String]()
    explicitDirs.forEach(d =>
      if (d == k || d.startsWith(prefix)) removedDirs.add(d))
    removedDirs.forEach(d => explicitDirs.remove(d))
    removedFile || !children.isEmpty || !removedDirs.isEmpty
  }

  private def isDir(k: String): Boolean = {
    if (k == "/" || k.isEmpty) return true
    if (explicitDirs.contains(k)) return true
    val prefix = k + "/"
    val it = store.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(prefix)) return true
    false
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    val bytes = store.get(k)
    val qualified = f.makeQualified(myUri, workDir)
    if (bytes != null)
      new FileStatus(bytes.length.toLong, false, 1, 64L << 20, 0L, qualified)
    else if (isDir(k))
      new FileStatus(0L, true, 1, 64L << 20, 0L, qualified)
    else throw new FileNotFoundException(f.toString)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (store.containsKey(k)) return Array(getFileStatus(f))
    if (!isDir(k)) throw new FileNotFoundException(f.toString)
    val prefix = if (k == "/") "/" else k + "/"
    val names = ConcurrentHashMap.newKeySet[String]()
    store.keySet().forEach { c =>
      if (c.startsWith(prefix)) {
        val rest = c.substring(prefix.length)
        val slash = rest.indexOf('/')
        names.add(prefix + (if (slash >= 0) rest.substring(0, slash) else rest))
      }
    }
    explicitDirs.forEach { d =>
      if (d.startsWith(prefix) && d.length > prefix.length &&
          !d.substring(prefix.length).contains("/")) names.add(d)
    }
    val out = new java.util.ArrayList[FileStatus]()
    names.forEach(n =>
      out.add(getFileStatus(new Path(myUri.toString + n))))
    out.toArray(new Array[FileStatus](0))
  }

  /** Children (file keys and explicit dirs) under a directory key. */
  protected def childKeys(k: String): Seq[String] = {
    val prefix = if (k == "/") "/" else k + "/"
    val out = scala.collection.mutable.ArrayBuffer[String]()
    store.keySet().forEach(c => if (c.startsWith(prefix)) out += c)
    out.toSeq
  }

  /** Directory rename support for the two fakes (Spark's file-output
    * committer renames task directories into place): move every key
    * under the source prefix. Subclasses decide the FILE semantics;
    * directory moves here are only used by single-writer committers in
    * the conformance lifecycle, never as the commit point — the commit
    * point is always the manifest publish. */
  protected def renameDir(src: Path, dst: Path,
      failIfDstExists: Boolean): Boolean = {
    val sk = key(src); val dk = key(dst)
    if (failIfDstExists && (store.containsKey(dk) ||
        explicitDirs.contains(dk) || !childKeys(dk).isEmpty)) return false
    childKeys(sk).foreach { c =>
      store.put(dk + c.substring(sk.length), store.remove(c))
    }
    val movedDirs = new java.util.ArrayList[String]()
    explicitDirs.forEach(d =>
      if (d == sk || d.startsWith(sk + "/")) movedDirs.add(d))
    movedDirs.forEach { d =>
      explicitDirs.remove(d)
      explicitDirs.add(dk + d.substring(sk.length))
    }
    true
  }

  protected def isDirKey(k: String): Boolean =
    explicitDirs.contains(k) || !childKeys(k).isEmpty
}

/** HDFS-contract fake (scheme `memhdfs`): rename is ATOMIC and fails
  * when the destination exists, leaving it intact — a true conditional
  * put, modeled with `putIfAbsent`. This is the filesystem the generic
  * branch of `ManifestSink.tryPublishNew` assumes; the conformance spec
  * drives that branch through this fake under contention. */
class MemHdfsFileSystem extends MemFileSystemBase {
  override def getScheme: String = "memhdfs"
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    if (isDirKey(sk) && !store.containsKey(sk))
      return renameDir(src, dst, failIfDstExists = true)
    val data = store.get(sk)
    if (data == null) return false
    if (store.putIfAbsent(key(dst), data) != null) false
    else { store.remove(sk); true }
  }
}

/** Object-store fake (scheme `mos`): rename is a client-side COPY then
  * DELETE — neither atomic nor exclusive, exactly the S3/GCS/ABFS
  * behavior that makes rename-as-commit lose commits (two racers both
  * "succeed"; the last PUT silently wins). `ManifestSink` refuses this
  * scheme unless a conditional-put seam ([[MemBlobStore.ifNoneMatchPut]]
  * is the reference one) is registered. */
class MemObjectStoreFileSystem extends MemFileSystemBase {
  override def getScheme: String = "mos"
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    if (isDirKey(sk) && !store.containsKey(sk))
      return renameDir(src, dst, failIfDstExists = false)
    val data = store.get(sk)
    if (data == null) return false
    store.put(key(dst), data) // unconditional PUT: last writer wins
    store.remove(sk)
    true
  }
}
