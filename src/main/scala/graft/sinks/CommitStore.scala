package graft.sinks

import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

/** The atomic commit primitive both table sinks build their optimistic
  * concurrency on: put-if-absent of a fully-formed metadata object at a
  * version-numbered key. Whoever creates the key owns that version; a loser
  * sees [[FileAlreadyExistsException]], re-reads table state and retries at
  * the next version.
  *
  * This is the same primitive the reference negotiates with its object
  * store: `copy_if_not_exists` / conditional put for the Delta commit
  * (/root/reference/src/delta_destination.rs:377-402) and `write_exclusive`
  * for the Iceberg metadata version (iceberg_destination.rs:349-367). The
  * store-specific spellings:
  *
  *  - local/HDFS-like FS: `CREATE_NEW` open ([[CommitStore.Local]] — the
  *    only impl runnable in this offline container);
  *  - S3: `PutObject` with `If-None-Match: *` (natively supported since
  *    2024; earlier S3 needed a DynamoDB lock table — that variant is out
  *    of scope);
  *  - GCS: upload with `x-goog-if-generation-match: 0`;
  *  - Azure ADLS: create with `If-None-Match: *`.
  *
  * Everything else the sinks write (data files, manifests, checkpoints) is
  * staged under unique names where plain puts are safe; ONLY the
  * version-claiming put needs the conditional semantics, which is why the
  * interface is this narrow.
  */
trait CommitStore {

  /** Atomically creates `target` with `bytes` iff no object exists there.
    *
    * @throws FileAlreadyExistsException if `target` already exists — the
    *         OCC conflict signal the sinks' retry loops catch.
    */
  def putIfAbsent(target: Path, bytes: Array[Byte]): Unit

  /** EXECUTOR-shippable byte I/O for this store, when it has one — what a
    * write path needs to fan artifact packing out of the driver (the
    * 100 TB deletion-vector write packs and PUBLISHES per-shard
    * sidecar/Puffin files FROM TASKS, returning only KB-scale descriptors
    * to the driver). None for driver-local test doubles (in-memory maps,
    * hooked stores) — callers fall back to a driver-streamed publish
    * bounded at one shard in memory.
    */
  def taskIO: Option[TaskIO] = None
}

/** The narrow read/write surface a TASK needs ([[CommitStore.taskIO]]).
  * Implementations are [[Serializable]] (they travel in task closures) and
  * carry no driver-only state: [[CommitStore.LocalTaskIO]] is the
  * shared-filesystem spelling (every executor of a real cluster mounts the
  * warehouse), [[HttpObjectStore.Client]]'s re-dials the store endpoint
  * lazily per JVM. Targets are txn-unique names, so plain overwrite
  * semantics make task RETRIES idempotent.
  */
trait TaskIO extends Serializable {
  def read(absPath: String): Array[Byte]
  def write(absPath: String, bytes: Array[Byte]): Unit
}

/** A [[CommitStore]] that ALSO transports data objects — the full
  * object-store surface the reference's pipeline drives
  * (/root/reference/src/delta_destination.rs:70-477 is one flow: multipart
  * data-file uploads + a conditional-put log commit). When a sink is given
  * an [[ObjectStore]], its staged parquet files are PUBLISHED through
  * [[putObject]] (an [[HttpObjectStore.Client]] multiparts them over TCP)
  * instead of a local rename, so every byte of the table — data and log —
  * travels the store protocol.
  */
trait ObjectStore extends CommitStore {

  /** Publishes a fully-staged data object at `target`. Data files carry
    * txn-unique names, so plain-put overwrite semantics are safe (only the
    * version-claiming log put needs [[putIfAbsent]]).
    */
  def putObject(target: Path, bytes: Array[Byte]): Unit

  /** Removes the object at `target` — the abort/vacuum reclaim. Absent
    * objects are a no-op (aborts may race their own failed uploads).
    */
  def deleteObject(target: Path): Unit

  /** Keys at or under `prefix` (the ListObjectsV2 analogue), empty when
    * nothing is there. What a replace-in-place needs: the checkpoint
    * publisher lists and deletes any stale parts at its target version
    * before uploading, mirroring the local path's delete-then-rename —
    * otherwise a failed partial upload or same-version re-checkpoint
    * leaves orphan part files no vacuum ever reclaims.
    */
  def listPrefix(prefix: Path): Seq[Path]

  /** Keys at or under `prefix` WITH their last-modified millis — the
    * ListObjectsV2 metadata a store returns with every page anyway.
    * What an age-gated sweep ([[IcebergSink.removeOrphanFiles]]) needs:
    * the orphan decision is (key, mtime, referenced?) per object, so the
    * whole sweep can run off one listing with no per-object HEAD calls.
    */
  def listPrefixMeta(prefix: Path): Seq[(Path, Long)]

  /** The object's bytes (the GetObject analogue) — what the sinks' own
    * metadata-plane reads (deletion-vector sidecars, manifest merges)
    * travel when the table lives in a bucket: a real store has no local
    * open, and routing these through the protocol is what makes the
    * sink's every byte store-resident. Missing objects throw
    * [[java.io.FileNotFoundException]].
    */
  def readObject(target: Path): Array[Byte]
}

object CommitStore {

  /** Local-filesystem store: `CREATE_NEW` is the put-if-absent (POSIX
    * O_EXCL — atomic on local FS and NFSv3+).
    */
  object Local extends CommitStore {
    override def putIfAbsent(target: Path, bytes: Array[Byte]): Unit =
      Files.write(target, bytes, StandardOpenOption.CREATE_NEW)
    override def taskIO: Option[TaskIO] = Some(LocalTaskIO)
  }

  /** Shared-filesystem [[TaskIO]]: plain file reads and parent-creating
    * writes, valid from any executor that mounts the warehouse path (the
    * cluster analogue of [[Local]]). Stateless, so deserializing a copy
    * per task is free.
    */
  object LocalTaskIO extends TaskIO {
    override def read(absPath: String): Array[Byte] =
      Files.readAllBytes(java.nio.file.Paths.get(absPath))
    override def write(absPath: String, bytes: Array[Byte]): Unit = {
      val p = java.nio.file.Paths.get(absPath)
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, bytes): Unit
    }
  }

  /** In-memory store with an optional pre-put hook, for OCC protocol tests:
    * the hook runs before each put attempt and may itself commit (a
    * simulated concurrent writer landing in the validate→commit window) or
    * throw. Keys are the string form of the path.
    */
  final class InMemory(hook: (Path, Int) => Unit = (_, _) => ()) extends CommitStore {
    private val objects = new ConcurrentHashMap[String, Array[Byte]]()
    private val attempts = new java.util.concurrent.atomic.AtomicInteger(0)

    override def putIfAbsent(target: Path, bytes: Array[Byte]): Unit = {
      hook(target, attempts.getAndIncrement())
      if (objects.putIfAbsent(target.toString, bytes) != null)
        throw new FileAlreadyExistsException(target.toString)
    }

    def get(target: Path): Option[Array[Byte]] = Option(objects.get(target.toString))
    def keys: Set[String] = {
      import scala.jdk.CollectionConverters._
      objects.keySet().asScala.toSet
    }
    /** Direct insert bypassing the hook — the "concurrent writer". */
    def forcePut(target: Path, bytes: Array[Byte]): Boolean =
      objects.putIfAbsent(target.toString, bytes) == null
  }

  /** Local-FS store whose pre-put hook lets a test interleave a competing
    * writer between a sink's state validation and its commit attempt — the
    * exact window the OCC loops must re-validate across. `hook(target,
    * attemptIndex)` runs before each delegated put.
    */
  final class HookedLocal(hook: (Path, Int) => Unit) extends CommitStore {
    private val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    override def putIfAbsent(target: Path, bytes: Array[Byte]): Unit = {
      hook(target, attempts.getAndIncrement())
      Local.putIfAbsent(target, bytes)
    }
  }

  /** Eventual-consistency simulator: the conditional put itself stays
    * STRONGLY consistent (two writers at one key — exactly one wins, like
    * S3 `PutObject` + `If-None-Match: *`), but the accepted object only
    * MATERIALIZES at `target` — where readers list and replay — after
    * `visibilityDelayMs`, via write-to-temp + atomic rename on a background
    * thread. This is the store shape that breaks naive OCC loops: a writer
    * whose listing lags the commit frontier re-claims the same version
    * forever unless it treats its own AlreadyExists as proof the version
    * exists (DeltaSink.append's `minNext` floor). A pre-existing object at
    * `target` (e.g. a table created through [[Local]]) conflicts as usual.
    *
    * In-process claims registry = the store's authoritative key space; one
    * instance therefore models one bucket and must be shared by every
    * concurrent writer in the test.
    */
  final class DelayedVisibilityLocal(visibilityDelayMs: Long) extends CommitStore with AutoCloseable {
    private val claims = ConcurrentHashMap.newKeySet[String]()
    private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    // First background materialization failure, rethrown from awaitVisible/
    // close: without this an accepted commit could stay permanently invisible
    // with no signal and replay would silently see a truncated version chain
    // (ADVICE r5).
    private val firstFailure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    private val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => { val t = new Thread(r, "graft-delayed-visibility"); t.setDaemon(true); t })

    override def putIfAbsent(target: Path, bytes: Array[Byte]): Unit = {
      if (Files.exists(target) || !claims.add(target.toString))
        throw new FileAlreadyExistsException(target.toString)
      inFlight.incrementAndGet()
      exec.schedule(new Runnable {
        override def run(): Unit = {
          try {
            val tmp = Files.createTempFile(target.getParent, ".graft-staged-", ".tmp")
            Files.write(tmp, bytes)
            Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          } catch {
            case t: Throwable => firstFailure.compareAndSet(null, t); throw t
          } finally inFlight.decrementAndGet()
        }
      }, visibilityDelayMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    }

    /** Blocks until every accepted commit has materialized — test barrier
      * before reading the table back. Rethrows the first background
      * materialization failure, if any.
      */
    def awaitVisible(timeoutMs: Long = 30000): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (inFlight.get() > 0 && System.nanoTime() < deadline) Thread.sleep(5)
      Option(firstFailure.get()).foreach(t =>
        throw new IllegalStateException("staged commit failed to materialize", t))
      require(inFlight.get() == 0, "staged commits still invisible after timeout")
    }

    override def close(): Unit = { awaitVisible(); exec.shutdown() }
  }

  /** Maps the ambient object-store credential environment to the Hadoop/S3A
    * configuration Spark's S3 committers consume — the documented equivalent
    * of the reference's env pickup (`delta_destination.rs:232-251` reads
    * AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY / AWS_SESSION_TOKEN /
    * AWS_ENDPOINT / AWS_REGION / AWS_ALLOW_HTTP into its object-store
    * client). Pure translation, no IO: callers apply the result with
    * `spark.conf.set` / `--conf spark.hadoop.*`. hadoop-aws is not on this
    * container's classpath, so this mapping is the contract, not a live
    * path — which is also why it stays a plain function.
    */
  def s3ConfFromEnv(env: Map[String, String]): Map[String, String] = {
    // ordering = precedence (later wins in toMap): the specific/override
    // variables (AWS_REGION, AWS_ENDPOINT_URL) beat their ambient
    // fallbacks (AWS_DEFAULT_REGION, AWS_ENDPOINT), matching AWS SDK
    // resolution order
    val direct = Seq(
      "AWS_ACCESS_KEY_ID" -> "fs.s3a.access.key",
      "AWS_SECRET_ACCESS_KEY" -> "fs.s3a.secret.key",
      "AWS_SESSION_TOKEN" -> "fs.s3a.session.token",
      "AWS_DEFAULT_REGION" -> "fs.s3a.endpoint.region",
      "AWS_REGION" -> "fs.s3a.endpoint.region",
      "AWS_ENDPOINT" -> "fs.s3a.endpoint",
      "AWS_ENDPOINT_URL" -> "fs.s3a.endpoint")
    val mapped = direct.flatMap { case (e, k) => env.get(e).map(k -> _) }.toMap
    // AWS_ALLOW_HTTP=true (MinIO-style endpoints) → plain-HTTP connections
    val ssl = env.get("AWS_ALLOW_HTTP").filter(_.equalsIgnoreCase("true"))
      .map(_ => "fs.s3a.connection.ssl.enabled" -> "false")
    // path-style access is what non-AWS endpoints (MinIO) need
    val pathStyle = env.get("AWS_ENDPOINT").orElse(env.get("AWS_ENDPOINT_URL"))
      .map(_ => "fs.s3a.path.style.access" -> "true")
    mapped ++ ssl ++ pathStyle
  }

  /** GOOGLE_* environment → the Hadoop GCS-connector configuration, the
    * `gs://` leg of the reference's per-scheme env pickup
    * (`delta_destination.rs:244-250` forwards every GOOGLE_* var to its
    * GCS client). Credential file pointers (either the gcloud-standard
    * GOOGLE_APPLICATION_CREDENTIALS or the object_store-style
    * GOOGLE_SERVICE_ACCOUNT[_PATH]) select keyfile auth explicitly so the
    * connector does not fall through to metadata-server auth on a VM.
    */
  def gcsConfFromEnv(env: Map[String, String]): Map[String, String] = {
    val keyfile = env.get("GOOGLE_APPLICATION_CREDENTIALS")
      .orElse(env.get("GOOGLE_SERVICE_ACCOUNT"))
      .orElse(env.get("GOOGLE_SERVICE_ACCOUNT_PATH"))
      .map("fs.gs.auth.service.account.json.keyfile" -> _)
    val authType = keyfile.map(_ =>
      "fs.gs.auth.type" -> "SERVICE_ACCOUNT_JSON_KEYFILE")
    val project = env.get("GOOGLE_CLOUD_PROJECT")
      .orElse(env.get("GOOGLE_PROJECT_ID"))
      .map("fs.gs.project.id" -> _)
    (keyfile ++ authType ++ project).toMap
  }

  /** AZURE_* environment → hadoop-azure (ABFS) configuration, the
    * `az`/`abfs(s)` leg of the reference's per-scheme env pickup
    * (`delta_destination.rs:244-250`). Account-scoped keys need the
    * account name to form their suffix, so without
    * AZURE_STORAGE_ACCOUNT_NAME only global settings can map. Precedence
    * mirrors the Azure SDK: an explicit account key beats SAS beats OAuth
    * client credentials.
    */
  def azureConfFromEnv(env: Map[String, String]): Map[String, String] = {
    val account = env.get("AZURE_STORAGE_ACCOUNT_NAME")
    def scoped(k: String) = account.map(a => s"$k.$a.dfs.core.windows.net")
    val key = for {
      conf <- scoped("fs.azure.account.key")
      v <- env.get("AZURE_STORAGE_ACCOUNT_KEY")
    } yield Map(conf -> v,
      scoped("fs.azure.account.auth.type").get -> "SharedKey")
    val sas = for {
      conf <- scoped("fs.azure.sas.fixed.token")
      v <- env.get("AZURE_STORAGE_SAS_TOKEN").orElse(env.get("AZURE_STORAGE_SAS_KEY"))
    } yield Map(conf -> v,
      scoped("fs.azure.account.auth.type").get -> "SAS",
      scoped("fs.azure.sas.token.provider.type").get ->
        "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider")
    val oauth = for {
      id <- env.get("AZURE_STORAGE_CLIENT_ID")
      secret <- env.get("AZURE_STORAGE_CLIENT_SECRET")
      tenant <- env.get("AZURE_STORAGE_TENANT_ID")
      if account.isDefined
    } yield Map(
      scoped("fs.azure.account.auth.type").get -> "OAuth",
      scoped("fs.azure.account.oauth.provider.type").get ->
        "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
      scoped("fs.azure.account.oauth2.client.id").get -> id,
      scoped("fs.azure.account.oauth2.client.secret").get -> secret,
      scoped("fs.azure.account.oauth2.client.endpoint").get ->
        s"https://login.microsoftonline.com/$tenant/oauth2/token")
    key.orElse(sas).orElse(oauth).getOrElse(Map.empty)
  }

  /** Per-scheme dispatch, the shape of the reference's
    * `object_store_keys_from_env(url_scheme)`
    * (`delta_destination.rs:244-250`): s3/s3a → AWS_*, gs → GOOGLE_*,
    * az/adl/azure/abfs/abfss → AZURE_*, anything else (file, hdfs) maps
    * nothing.
    */
  def confFromEnv(urlScheme: String, env: Map[String, String]): Map[String, String] =
    urlScheme match {
      case "s3" | "s3a" => s3ConfFromEnv(env)
      case "gs" => gcsConfFromEnv(env)
      case "az" | "adl" | "azure" | "abfs" | "abfss" => azureConfFromEnv(env)
      case _ => Map.empty
    }
}
