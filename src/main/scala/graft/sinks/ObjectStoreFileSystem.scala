package graft.sinks

import java.io.FileNotFoundException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FSDataInputStream, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-side Hadoop `FileSystem` over the S3-shaped [[HttpObjectStore]]
  * protocol — the piece that lets SPARK ITSELF scan parquet THROUGH the
  * store instead of through the server's backing directory, closing the
  * loop on the object-store pipeline: sinks publish via multipart +
  * conditional put, and `spark.read.parquet("graftobj://host:port/key")`
  * lists via the prefix-listing endpoint and opens objects via GET over
  * real TCP — the role hadoop-aws's S3AFileSystem plays against real S3
  * (absent from this offline container, SURVEY §7.1).
  *
  * Register with
  * `spark.hadoopConfiguration.set("fs.graftobj.impl", classOf[ObjectStoreFileSystem].getName)`;
  * the URI authority is the store endpoint (`graftobj://127.0.0.1:PORT/...`).
  *
  * Scope: read path only (`open`/`getFileStatus`/`listStatus` — what a
  * table SCAN needs; writes go through the sinks' [[ObjectStore]]
  * publication, never through a Hadoop stream), and `open` buffers the
  * whole object (bounded by the sinks' maxRecordsPerFile) — a production
  * client would range-GET instead. Directories are implied by key
  * prefixes, exactly like S3.
  */
final class ObjectStoreFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var endpoint: URI = _
  private var workingDir: Path = _
  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    require(name.getAuthority != null, s"graftobj URI needs host:port, got $name")
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    endpoint = URI.create(s"http://${name.getAuthority}")
    workingDir = new Path(fsUri.toString + "/")
    setConf(conf)
  }

  override def getScheme: String = "graftobj"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }

  private def keyOf(f: Path): String =
    f.toUri.getPath.stripPrefix("/")

  /** `key size` lines at or under the prefix — empty when nothing there. */
  private def list(prefix: String): Seq[(String, Long)] = {
    val resp = http.send(
      HttpRequest.newBuilder(endpoint.resolve("/o/" + prefix + "?list")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) Nil
    else resp.body().linesIterator.filter(_.nonEmpty).map { l =>
      val i = l.lastIndexOf(' ')
      (l.substring(0, i), l.substring(i + 1).toLong)
    }.toSeq
  }

  private def fileStatus(key: String, size: Long, isDir: Boolean): FileStatus =
    new FileStatus(size, isDir, 1, 128L * 1024 * 1024, 0L,
      new Path(fsUri.toString + "/" + key))

  override def getFileStatus(f: Path): FileStatus = {
    val k = keyOf(f)
    if (k.isEmpty) return fileStatus("", 0L, isDir = true)
    val entries = list(k)
    entries.find(_._1 == k) match {
      case Some((_, size)) => fileStatus(k, size, isDir = false)
      case None if entries.exists(_._1.startsWith(k + "/")) =>
        fileStatus(k, 0L, isDir = true)
      case None => throw new FileNotFoundException(s"graftobj key not found: $k")
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = keyOf(f)
    val entries = list(k)
    if (entries.isEmpty) throw new FileNotFoundException(s"graftobj key not found: $k")
    if (entries.map(_._1) == Seq(k)) return Array(fileStatus(k, entries.head._2, isDir = false))
    val prefix = if (k.isEmpty) "" else k + "/"
    val files = scala.collection.mutable.ArrayBuffer[FileStatus]()
    val dirs = scala.collection.mutable.LinkedHashSet[String]()
    entries.foreach { case (ck, size) =>
      if (ck.startsWith(prefix) && ck != k) {
        val rest = ck.stripPrefix(prefix)
        val slash = rest.indexOf('/')
        if (slash < 0) files += fileStatus(ck, size, isDir = false)
        else dirs += prefix + rest.take(slash)
      }
    }
    (files ++ dirs.map(d => fileStatus(d, 0L, isDir = true))).toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = keyOf(f)
    val resp = http.send(
      HttpRequest.newBuilder(endpoint.resolve("/o/" + k)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() != 200)
      throw new FileNotFoundException(s"graftobj GET $k: HTTP ${resp.statusCode()}")
    new FSDataInputStream(new ObjectStoreFileSystem.BytesStream(resp.body()))
  }

  private def readOnly(op: String) = throw new UnsupportedOperationException(
    s"graftobj is the read-side adapter; $op goes through the sinks' ObjectStore publication")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly("create")
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly("append")
  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    true // directories are implied by key prefixes — nothing to create
}

object ObjectStoreFileSystem {

  /** Whole-object in-memory stream with the seek/pread surface parquet
    * footers need. `pos` is ByteArrayInputStream's protected cursor.
    */
  private final class BytesStream(bytes: Array[Byte])
      extends java.io.ByteArrayInputStream(bytes)
      with org.apache.hadoop.fs.Seekable
      with org.apache.hadoop.fs.PositionedReadable {

    override def seek(target: Long): Unit = {
      if (target < 0 || target > bytes.length)
        throw new java.io.EOFException(s"seek($target) outside [0, ${bytes.length}]")
      pos = target.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(target: Long): Boolean = false

    override def read(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Int = {
      if (position >= bytes.length) -1
      else {
        val n = math.min(length, bytes.length - position.toInt)
        System.arraycopy(bytes, position.toInt, buffer, offset, n)
        n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit =
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException(
          s"readFully($position, $length) past end ${bytes.length}")
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
