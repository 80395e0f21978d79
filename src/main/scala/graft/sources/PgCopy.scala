package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Spark-native PostgreSQL serving WITHOUT a JDBC driver: a minimal
  * v3 wire-protocol client (startup / auth / simple query / COPY
  * sub-protocol — the published frontend/backend protocol, reference
  * `src/process_to_curated.py:189-198` serves gold to PostgreSQL via
  * SQLAlchemy `to_sql`) plus a [[PgCopySink]] that lands a DataFrame
  * into a PostgreSQL table by streaming `COPY ... FROM STDIN` from
  * EVERY EXECUTOR PARTITION IN PARALLEL — the bulk-load path
  * PostgreSQL itself recommends, and strictly faster than row-wise
  * JDBC INSERTs at scale (one round-trip per ~64 KB chunk, server-side
  * parsing of the text format, no statement overhead per row).
  *
  * Why this exists: the sandbox ships PostgreSQL 15 server binaries
  * but no `org.postgresql.Driver` jar (zero egress), so
  * `df.write.jdbc` cannot speak to it. The protocol is public and
  * small; this client implements exactly the subset serving needs:
  *  - startup + auth: trust, cleartext password, md5, and
  *    SCRAM-SHA-256 (the PG10+ default) — all from the published
  *    protocol/RFC 5802, JDK crypto only;
  *  - simple query (`Q`) for DDL;
  *  - COPY IN (`G`/`d`/`c`) for the data path.
  *
  * Scale posture: one connection per partition, each COPY atomic
  * (PostgreSQL commits a COPY statement as one transaction — a task
  * that dies mid-stream rolls back cleanly, so Spark's task retry
  * re-COPYs that partition without duplicates; a task that dies
  * AFTER its COPY committed would duplicate on retry — the same
  * at-least-once caveat every parallel JDBC/COPY writer carries; for
  * exactly-once land into a staging table and swap server-side).
  * Callers bound server fan-in with `maxConnections` (repartitions
  * down when the frame is wider than the cap). */
object PgWire {

  /** One open protocol connection. Not thread-safe (one per task). */
  final class PgConn(host: String, port: Int, db: String, user: String,
      password: String) {
    private val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), 15000)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream, 1 << 16))
    private val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream, 1 << 16))

    // ---- low-level framing -------------------------------------------
    private def send(msgType: Byte, body: Array[Byte]): Unit = {
      out.writeByte(msgType)
      out.writeInt(body.length + 4)
      out.write(body)
    }
    private def cstr(s: String): Array[Byte] = {
      val b = s.getBytes(UTF_8)
      java.util.Arrays.copyOf(b, b.length + 1) // trailing NUL
    }
    /** (type, body) of the next backend message. */
    private def recv(): (Byte, Array[Byte]) = {
      val t = in.readByte()
      val len = in.readInt() - 4
      val body = new Array[Byte](len)
      in.readFully(body)
      (t, body)
    }
    private def fail(body: Array[Byte]): Nothing = {
      // ErrorResponse: (fieldCode byte, cstring)* NUL
      val fields = scala.collection.mutable.Map[Char, String]()
      var i = 0
      while (i < body.length && body(i) != 0) {
        val code = body(i).toChar; i += 1
        val start = i
        while (body(i) != 0) i += 1
        fields(code) = new String(body, start, i - start, UTF_8)
        i += 1
      }
      throw new java.io.IOException("postgres error " +
        fields.getOrElse('C', "?") + ": " + fields.getOrElse('M', "?"))
    }

    // ---- startup + auth ----------------------------------------------
    {
      val params = Array("user", user, "database", db,
        "client_encoding", "UTF8", "application_name", "graft-pgcopy")
      val body = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(body)
      d.writeInt(196608) // protocol 3.0
      params.foreach(p => d.write(cstr(p)))
      d.writeByte(0)
      val b = body.toByteArray
      out.writeInt(b.length + 4); out.write(b); out.flush()
      authenticate()
      drainUntilReady()
    }

    private def authenticate(): Unit = {
      val (t, body) = recv()
      if (t == 'E') fail(body)
      require(t == 'R', s"expected Authentication, got '${t.toChar}'")
      val code = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
        ((body(2) & 0xff) << 8) | (body(3) & 0xff)
      code match {
        case 0 => () // AuthenticationOk (trust)
        case 3 => // cleartext password
          send('p', cstr(password)); out.flush(); authenticate()
        case 5 => // md5: md5(md5(password + user) + salt), hex, "md5" prefix
          val md = java.security.MessageDigest.getInstance("MD5")
          def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
          val inner = hex(md.digest((password + user).getBytes(UTF_8)))
          md.reset()
          md.update(inner.getBytes(UTF_8))
          md.update(body, 4, 4) // salt
          send('p', cstr("md5" + hex(md.digest()))); out.flush()
          authenticate()
        case 10 => scramAuth(); authenticate() // scramAuth consumes SASLFinal
        case 12 =>
          throw new java.io.IOException(
            "unexpected AuthenticationSASLFinal outside a SCRAM exchange")
        case other =>
          throw new java.io.IOException(
            s"unsupported postgres auth method $other")
      }
    }

    /** SCRAM-SHA-256 (RFC 5802 / RFC 7677) — the PG10+ password
      * default. JDK crypto only. */
    private def scramAuth(): Unit = {
      val rnd = new java.security.SecureRandom()
      val nonceBytes = new Array[Byte](18); rnd.nextBytes(nonceBytes)
      val clientNonce = java.util.Base64.getEncoder.encodeToString(nonceBytes)
      val clientFirstBare = s"n=,r=$clientNonce"
      // SASLInitialResponse: mechanism cstring + Int32 len + payload
      val payload = ("n,," + clientFirstBare).getBytes(UTF_8)
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr("SCRAM-SHA-256")); d.writeInt(payload.length); d.write(payload)
      send('p', b.toByteArray); out.flush()

      val (t1, body1) = recv()
      if (t1 == 'E') fail(body1)
      require(t1 == 'R', s"expected SASLContinue, got '${t1.toChar}'")
      val serverFirst = new String(body1, 4, body1.length - 4, UTF_8)
      val attrs = serverFirst.split(",").map { kv =>
        kv.splitAt(kv.indexOf('=')) match { case (k, v) => k -> v.drop(1) }
      }.toMap
      val serverNonce = attrs("r"); val salt = attrs("s"); val iters = attrs("i").toInt
      require(serverNonce.startsWith(clientNonce), "SCRAM nonce mismatch")

      val spec = new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, java.util.Base64.getDecoder.decode(salt),
        iters, 256)
      val salted = javax.crypto.SecretKeyFactory
        .getInstance("PBKDF2WithHmacSHA256").generateSecret(spec).getEncoded
      def hmac(key: Array[Byte], msg: String): Array[Byte] = {
        val m = javax.crypto.Mac.getInstance("HmacSHA256")
        m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
        m.doFinal(msg.getBytes(UTF_8))
      }
      val clientKey = hmac(salted, "Client Key")
      val storedKey = java.security.MessageDigest.getInstance("SHA-256")
        .digest(clientKey)
      val channelBinding = "c=" + java.util.Base64.getEncoder
        .encodeToString("n,,".getBytes(UTF_8)) // "biws"
      val clientFinalNoProof = s"$channelBinding,r=$serverNonce"
      val authMessage = s"$clientFirstBare,$serverFirst,$clientFinalNoProof"
      val clientSig = hmac(storedKey, authMessage)
      val proof = clientKey.zip(clientSig).map { case (a, c) => (a ^ c).toByte }
      val clientFinal = clientFinalNoProof + ",p=" +
        java.util.Base64.getEncoder.encodeToString(proof)
      send('p', clientFinal.getBytes(UTF_8)); out.flush()

      // MUTUAL authentication (RFC 5802 §3): the server proves it
      // knows the password derivation by sending v=ServerSignature in
      // AuthenticationSASLFinal. Verifying it rejects a spoofed
      // endpoint before any data is served to it.
      val (t2, body2) = recv()
      if (t2 == 'E') fail(body2)
      require(t2 == 'R', s"expected SASLFinal, got '${t2.toChar}'")
      val code2 = ((body2(0) & 0xff) << 24) | ((body2(1) & 0xff) << 16) |
        ((body2(2) & 0xff) << 8) | (body2(3) & 0xff)
      require(code2 == 12, s"expected AuthenticationSASLFinal(12), got $code2")
      val serverFinal = new String(body2, 4, body2.length - 4, UTF_8)
      val vAttr = serverFinal.split(",").collectFirst {
        case kv if kv.startsWith("v=") => kv.drop(2)
      }.getOrElse(throw new java.io.IOException(
        s"SASLFinal carried no v= signature: $serverFinal"))
      val serverKey = hmac(salted, "Server Key")
      val serverSig = hmac(serverKey, authMessage)
      val expected = java.util.Base64.getEncoder.encodeToString(serverSig)
      if (!java.security.MessageDigest.isEqual(
          expected.getBytes(UTF_8), vAttr.getBytes(UTF_8)))
        throw new java.io.IOException(
          "SCRAM server signature mismatch — endpoint failed mutual auth")
    }

    private def drainUntilReady(): Unit = {
      var done = false
      while (!done) {
        val (t, body) = recv()
        t match {
          case 'Z' => done = true // ReadyForQuery
          case 'E' => fail(body)
          case _ => () // ParameterStatus, BackendKeyData, NoticeResponse, ...
        }
      }
    }

    /** Execute one simple-protocol statement (DDL etc.); drains to
      * ReadyForQuery, throws on server error. */
    def simple(sql: String): Unit = {
      send('Q', cstr(sql)); out.flush()
      drainUntilReady()
    }

    /** Run `COPY ... FROM STDIN` and stream `lines` (text format, one
      * encoded row per element, NO trailing newline) in ~64 KB chunks.
      * Returns when the server confirms the commit. */
    def copyIn(copySql: String, lines: Iterator[String]): Unit = {
      send('Q', cstr(copySql)); out.flush()
      var inCopy = false
      while (!inCopy) {
        val (t, body) = recv()
        t match {
          case 'G' => inCopy = true // CopyInResponse
          case 'E' => fail(body)
          case _ => ()
        }
      }
      val buf = new java.io.ByteArrayOutputStream(1 << 16)
      def flushChunk(): Unit = if (buf.size() > 0) {
        send('d', buf.toByteArray); buf.reset()
      }
      lines.foreach { line =>
        buf.write(line.getBytes(UTF_8)); buf.write('\n')
        if (buf.size() >= (1 << 16)) flushChunk()
      }
      flushChunk()
      send('c', Array.emptyByteArray) // CopyDone
      out.flush()
      drainUntilReady() // CommandComplete then ReadyForQuery (or error)
    }

    /** Run `COPY ... TO STDOUT` and return the complete text-format
      * payload split into row lines. CopyData message boundaries are
      * arbitrary byte-stream chunks (the protocol guarantees nothing
      * about row alignment), so bytes accumulate first and split
      * once. Driver-side single stream — sized for serving-store
      * verification and model-sized reads, not corpus extraction. */
    def copyOut(copySql: String): Vector[String] = {
      send('Q', cstr(copySql)); out.flush()
      var started = false
      while (!started) {
        val (t, body) = recv()
        t match {
          case 'H' => started = true // CopyOutResponse
          case 'E' => fail(body)
          case _ => ()
        }
      }
      val buf = new java.io.ByteArrayOutputStream(1 << 20)
      var copying = true
      while (copying) {
        val (t, body) = recv()
        t match {
          case 'd' => buf.write(body)
          case 'c' => copying = false // CopyDone
          case 'E' => fail(body)
          case _ => ()
        }
      }
      drainUntilReady()
      val text = new String(buf.toByteArray, UTF_8)
      if (text.isEmpty) Vector.empty
      else text.split("\n", -1).toVector.dropRight(1) // trailing newline
    }

    def close(): Unit = {
      try { send('X', Array.emptyByteArray); out.flush() }
      catch { case _: Exception => () }
      sock.close()
    }
  }
}

/** Read a PostgreSQL table back into a DataFrame through COPY TO
  * STDOUT — the verification half of [[PgCopySink]] (serve → read
  * back → content-hash) with zero external tooling: the engine's own
  * wire client both ways. The stream lands on the driver (one COPY
  * stream), then parses DISTRIBUTED via a parallelized dataset —
  * appropriate for round-trip verification and modest serving
  * tables; corpus-scale extraction belongs on the lake, not the
  * serving store. */
object PgCopySource {

  /** Undo the COPY text escapes ([[PgCopySink.escape]]'s inverse). */
  private[graft] def unescape(s: String): String =
    if (s.indexOf('\\') < 0) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => sb.append('\\'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  private[graft] def parseField(dt: DataType, raw: String): Any =
    if (raw == "\\N") null
    else dt match {
      case StringType => unescape(raw)
      case TimestampType =>
        // PostgreSQL renders "yyyy-MM-dd HH:mm:ss[.ffffff]" at the
        // session zone; the sink wrote UTC wall-clock, read it back
        // the same way
        val base = java.time.LocalDateTime.parse(
          raw.replace(' ', 'T'),
          java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
        java.sql.Timestamp.from(base.toInstant(java.time.ZoneOffset.UTC))
      case DateType => java.sql.Date.valueOf(raw)
      case DoubleType => raw.toDouble
      case FloatType => raw.toFloat
      case LongType => raw.toLong
      case IntegerType => raw.toInt
      case ShortType => raw.toShort
      case ByteType => raw.toByte
      case BooleanType => raw == "t"
      case d: DecimalType => new java.math.BigDecimal(raw)
      case BinaryType =>
        val hexStr = unescape(raw).stripPrefix("\\x")
        hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      case ArrayType(et, _) if et == FloatType || et == DoubleType ||
          et == LongType || et == IntegerType =>
        val inner = raw.stripPrefix("{").stripSuffix("}")
        if (inner.isEmpty) Seq.empty
        else inner.split(",", -1).toIndexedSeq.map {
          case "NULL" => null
          // each branch ascribes Any: without it Scala HARMONIZES the
          // numeric branch types to their weak-conformance lub
          // (everything silently widens to Double — caught live by
          // the probe's real[] round trip, invisible to == checks)
          case v => et match {
            case FloatType => (v.toFloat: Any)
            case DoubleType => (v.toDouble: Any)
            case LongType => (v.toLong: Any)
            case IntegerType => (v.toInt: Any)
          }
        }
      case other => throw new IllegalArgumentException(
        s"PgCopySource: unsupported type $other")
    }

  /** Read `table` under `schema` (column order = schema order). */
  def read(spark: org.apache.spark.sql.SparkSession, host: String,
      port: Int, db: String, user: String, password: String,
      table: String, schema: StructType): DataFrame = {
    val qtable = "\"" + table.replace("\"", "\"\"") + "\""
    val cols = schema.fields
      .map(f => "\"" + f.name.replace("\"", "\"\"") + "\"").mkString(", ")
    val conn = new PgWire.PgConn(host, port, db, user, password)
    val lines =
      try conn.copyOut(
        s"COPY (SELECT $cols FROM $qtable) TO STDOUT (FORMAT text)")
      finally conn.close()
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.parallelize(lines,
        math.max(1, math.min(lines.size / 10000 + 1, 32)))
      .map { line =>
        val parts = line.split("\t", -1)
        Row.fromSeq(types.zip(parts).map { case (dt, raw) =>
          parseField(dt, raw)
        }.toIndexedSeq)
      }
    spark.createDataFrame(rows, schema)
  }
}

/** The K7 serving sink over [[PgWire]]: DDL on the driver, parallel
  * per-partition COPY from the executors. */
object PgCopySink {

  /** COPY-text escape: backslash, tab, LF, CR (the published text
    * format); everything else passes through verbatim — COPY text is
    * the one CSV-free bulk format with NO quoting ambiguity, so
    * values with genuine leading/trailing whitespace survive exactly
    * (the PgServeProbe CSV-trim lesson). */
  private[graft] def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd HH:mm:ss")

  /** One field → COPY text. Timestamps render at UTC (the engine's
    * pinned session zone), micros appended only when nonzero —
    * matching PostgreSQL's own output so round-trips are symmetric. */
  private[graft] def encodeField(dt: DataType, row: Row, i: Int): String =
    if (row.isNullAt(i)) "\\N"
    else dt match {
      case TimestampType =>
        val ts = row.getTimestamp(i)
        val ldt = java.time.LocalDateTime.ofInstant(
          ts.toInstant, java.time.ZoneOffset.UTC)
        val base = tsFmt.format(ldt)
        val micros = ldt.getNano / 1000
        if (micros == 0) base else f"$base.$micros%06d"
      case DateType => row.getDate(i).toLocalDate.toString
      case StringType => escape(row.getString(i))
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case ShortType => row.getShort(i).toString
      case ByteType => row.getByte(i).toString
      case BooleanType => if (row.getBoolean(i)) "t" else "f"
      case _: DecimalType => row.getDecimal(i).toPlainString
      case BinaryType => "\\\\x" + row.getAs[Array[Byte]](i)
        .map("%02x".format(_)).mkString
      case ArrayType(et, _) if et == FloatType || et == DoubleType ||
          et == LongType || et == IntegerType =>
        // numeric array literal: '{1.5,2.25,NULL}' — no quoting needed
        // (numeric renderings never collide with COPY or array syntax)
        row.getSeq[Any](i).map {
          case null => "NULL"
          case v => v.toString
        }.mkString("{", ",", "}")
      case other => throw new IllegalArgumentException(
        s"PgCopySink: unsupported type $other")
    }

  /** Spark type → PostgreSQL column type (the PgServeProbe mapping). */
  def pgType(dt: DataType): String = dt match {
    case TimestampType => "timestamp"
    case DateType => "date"
    case DoubleType => "double precision"
    case FloatType => "real"
    case LongType => "bigint"
    case IntegerType => "integer"
    case ShortType => "smallint"
    case ByteType => "smallint"
    case BooleanType => "boolean"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case BinaryType => "bytea"
    case ArrayType(FloatType, _) => "real[]"
    case ArrayType(DoubleType, _) => "double precision[]"
    case ArrayType(LongType, _) => "bigint[]"
    case ArrayType(IntegerType, _) => "integer[]"
    case _ => "text"
  }

  /** Land `df` in PostgreSQL table `table`: `overwrite` drops and
    * recreates (K7's `if_exists='replace'`), then every partition
    * COPYs in parallel over its own wire connection. `maxConnections`
    * caps server fan-in (a 1000-executor cluster must not open 1000
    * backends — PostgreSQL's default max_connections is 100). */
  def write(df: DataFrame, host: String, port: Int, db: String,
      user: String, password: String, table: String,
      overwrite: Boolean = true, maxConnections: Int = 8): Unit = {
    val schema = df.schema
    val qtable = "\"" + table.replace("\"", "\"\"") + "\""
    val cols = schema.fields.map(f =>
      "\"" + f.name.replace("\"", "\"\"") + "\"")
    val ddl = schema.fields.zip(cols)
      .map { case (f, q) => s"$q ${pgType(f.dataType)}" }.mkString(", ")
    val driver = new PgWire.PgConn(host, port, db, user, password)
    try {
      if (overwrite) driver.simple(s"DROP TABLE IF EXISTS $qtable")
      driver.simple(s"CREATE TABLE IF NOT EXISTS $qtable ($ddl)")
    } finally driver.close()

    val bounded =
      if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
      else df
    val copySql = s"COPY $qtable (${cols.mkString(", ")}) " +
      "FROM STDIN WITH (FORMAT text)"
    val types = schema.fields.map(_.dataType)
    bounded.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = new PgWire.PgConn(host, port, db, user, password)
        try conn.copyIn(copySql, rows.map { r =>
          val sb = new java.lang.StringBuilder(64)
          var i = 0
          while (i < types.length) {
            if (i > 0) sb.append('\t')
            sb.append(encodeField(types(i), r, i))
            i += 1
          }
          sb.toString
        })
        finally conn.close()
      }
    }
  }
}
