package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SASL SCRAM (RFC 5802/7677) for the Produce-v0 wire client — the auth
  * mechanism behind the reference's `SASL_SCRAM_USERNAME`/
  * `SASL_SCRAM_PASSWORD` env overrides (src/sink/kafka.rs:69-84, passed to
  * librdkafka). Pure JDK crypto: PBKDF2WithHmacSHA-N + HmacSHA-N, with the
  * hash parameterized over the two mechanisms Kafka brokers ship —
  * SCRAM-SHA-256 (the default) and SCRAM-SHA-512 (same RFC 5802
  * construction over SHA-512; selected by the librdkafka `sasl.mechanisms`
  * conf key).
  *
  * Wire framing: one Kafka SaslHandshake v0 round-trip announcing the
  * mechanism, then the SCRAM tokens as RAW length-prefixed frames — the
  * handshake-v0 token mode every broker keeps for compatibility (newer
  * clients wrap tokens in SaslAuthenticate; the exchange bytes are
  * identical). The client VERIFIES the server signature (`v=`), so a
  * server that doesn't hold the password is rejected — auth is mutual.
  */
object ScramAuth {
  /** One SCRAM hash family: every RFC 5802 primitive keyed off the same
    * digest. `keyBits` = digest size (the PBKDF2 output length, §3). */
  final case class Algo(mechanism: String, macName: String, mdName: String,
      pbkdf2Name: String, keyBits: Int)
  val Sha256: Algo =
    Algo("SCRAM-SHA-256", "HmacSHA256", "SHA-256", "PBKDF2WithHmacSHA256", 256)
  val Sha512: Algo =
    Algo("SCRAM-SHA-512", "HmacSHA512", "SHA-512", "PBKDF2WithHmacSHA512", 512)

  /** SASL/PLAIN (RFC 4616): one `\0user\0password` token after the
    * handshake — no challenge, no server proof, so it is only sane inside
    * TLS (which is exactly how clusters deploy it); hash-family fields
    * are unused on this path. */
  val Plain: Algo = Algo("PLAIN", "HmacSHA256", "SHA-256",
    "PBKDF2WithHmacSHA256", 256)

  val Mechanism = Sha256.mechanism

  /** librdkafka `sasl.mechanisms` value → algo (SCRAM + PLAIN; the
    * client has no GSSAPI path). */
  def algoFor(mechanism: String): Algo = mechanism.trim.toUpperCase match {
    case "SCRAM-SHA-256" | "" => Sha256
    case "SCRAM-SHA-512"      => Sha512
    case "PLAIN"              => Plain
    case m => throw new IllegalArgumentException(s"unsupported SASL mechanism: $m")
  }

  def hmac(key: Array[Byte], msg: Array[Byte], algo: Algo = Sha256): Array[Byte] = {
    val m = Mac.getInstance(algo.macName)
    m.init(new SecretKeySpec(key, algo.macName))
    m.doFinal(msg)
  }

  def hash(b: Array[Byte], algo: Algo = Sha256): Array[Byte] =
    java.security.MessageDigest.getInstance(algo.mdName).digest(b)

  def sha256(b: Array[Byte]): Array[Byte] = hash(b, Sha256)

  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int, algo: Algo = Sha256): Array[Byte] = {
    val skf = javax.crypto.SecretKeyFactory.getInstance(algo.pbkdf2Name)
    skf.generateSecret(
      new PBEKeySpec(password.toCharArray, salt, iterations, algo.keyBits))
      .getEncoded
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** RFC 5802 §5.1: "=" and "," in names escape to =3D / =2C. */
  def escapeUser(u: String): String =
    u.replace("=", "=3D").replace(",", "=2C")

  private def attrs(msg: String): Map[Char, String] =
    msg.split(',').filter(_.length >= 2).map(a => a.charAt(0) -> a.drop(2)).toMap

  private def sendToken(out: DataOutputStream, tok: String): Unit = {
    val b = tok.getBytes(UTF_8)
    out.writeInt(b.length); out.write(b); out.flush()
  }

  private def readToken(in: DataInputStream): String = {
    val n = in.readInt()
    if (n < 0 || n > (1 << 16))
      throw new IllegalStateException(s"implausible SASL token size $n")
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, UTF_8)
  }

  /** One SaslHandshake v0 round-trip + the three-message SCRAM exchange.
    * Throws IllegalStateException on any rejection — including a server
    * signature that does not verify. Call immediately after connect (and
    * TLS wrap, for sasl_ssl), before the first Produce frame. */
  def authenticate(in: DataInputStream, out: DataOutputStream,
      username: String, password: String,
      nonce: String = java.util.UUID.randomUUID.toString.replace("-", ""),
      algo: Algo = Sha256): Unit = {
    // ---- SaslHandshake v0 (api_key 17): announce the mechanism
    val clientId = "graft".getBytes(UTF_8)
    val mech = algo.mechanism.getBytes(UTF_8)
    val corr = 0x73617363 // "sasc"
    out.writeInt(2 + 2 + 4 + (2 + clientId.length) + (2 + mech.length))
    out.writeShort(17); out.writeShort(0); out.writeInt(corr)
    out.writeShort(clientId.length); out.write(clientId)
    out.writeShort(mech.length); out.write(mech)
    out.flush()
    val size = in.readInt()
    if (size < 6 || size > (1 << 20))
      throw new IllegalStateException(s"implausible SaslHandshake response size $size")
    if (in.readInt() != corr)
      throw new IllegalStateException("SaslHandshake correlation id mismatch")
    val err = in.readShort()
    if (err != 0)
      throw new IllegalStateException(s"SASL mechanism rejected: error $err")
    in.skipBytes(size - 6) // enabled_mechanisms array — not needed

    if (algo.mechanism == "PLAIN") {
      // RFC 4616: one authzid\0authcid\0password token; the broker answers
      // with an empty token on success and drops the connection otherwise
      sendToken(out, "\u0000" + username + "\u0000" + password)
      readToken(in) // success ack (empty); a rejection closes the socket
      return
    }

    // ---- SCRAM exchange over raw length-prefixed tokens
    val gs2 = "n,," // no channel binding, no authzid
    val clientFirstBare = s"n=${escapeUser(username)},r=$nonce"
    sendToken(out, gs2 + clientFirstBare)
    val serverFirst = readToken(in)
    val sf = attrs(serverFirst)
    val serverNonce = sf.getOrElse('r',
      throw new IllegalStateException(s"server-first missing nonce: $serverFirst"))
    if (!serverNonce.startsWith(nonce))
      throw new IllegalStateException("server nonce must extend the client nonce")
    val salt = Base64.getDecoder.decode(sf('s'))
    val iterations = sf('i').toInt
    val sp = saltedPassword(password, salt, iterations, algo)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8), algo)
    val storedKey = hash(clientKey, algo)
    val withoutProof =
      s"c=${Base64.getEncoder.encodeToString(gs2.getBytes(UTF_8))},r=$serverNonce"
    val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
    val proof = xor(clientKey, hmac(storedKey, authMessage.getBytes(UTF_8), algo))
    sendToken(out, s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}")
    val serverFinal = readToken(in)
    if (serverFinal.startsWith("e="))
      throw new IllegalStateException(s"SASL authentication failed: $serverFinal")
    // mutual auth: the server proves it holds the credential
    val serverKey = hmac(sp, "Server Key".getBytes(UTF_8), algo)
    val expected = Base64.getEncoder.encodeToString(
      hmac(serverKey, authMessage.getBytes(UTF_8), algo))
    if (!attrs(serverFinal).get('v').contains(expected))
      throw new IllegalStateException("server signature mismatch — not trusted")
  }
}
