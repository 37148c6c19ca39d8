package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SASL SCRAM-SHA-256 (RFC 5802/7677) for the Produce-v0 wire client — the
  * auth mechanism behind the reference's `SASL_SCRAM_USERNAME`/
  * `SASL_SCRAM_PASSWORD` env overrides (src/sink/kafka.rs:69-84, passed to
  * librdkafka). Pure JDK crypto: PBKDF2WithHmacSHA256 + HmacSHA256.
  *
  * Wire framing: one Kafka SaslHandshake v0 round-trip announcing the
  * mechanism, then the SCRAM tokens as RAW length-prefixed frames — the
  * handshake-v0 token mode every broker keeps for compatibility (newer
  * clients wrap tokens in SaslAuthenticate; the exchange bytes are
  * identical). The client VERIFIES the server signature (`v=`), so a
  * server that doesn't hold the password is rejected — auth is mutual.
  */
object ScramAuth {
  val Mechanism = "SCRAM-SHA-256"

  def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] = {
    val skf = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    skf.generateSecret(
      new PBEKeySpec(password.toCharArray, salt, iterations, 256)).getEncoded
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
      nonce: String = java.util.UUID.randomUUID.toString.replace("-", "")): Unit = {
    // ---- SaslHandshake v0 (api_key 17): announce the mechanism
    val clientId = "graft".getBytes(UTF_8)
    val mech = Mechanism.getBytes(UTF_8)
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

    // ---- SCRAM-SHA-256 exchange over raw length-prefixed tokens
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
    val sp = saltedPassword(password, salt, iterations)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
    val storedKey = sha256(clientKey)
    val withoutProof =
      s"c=${Base64.getEncoder.encodeToString(gs2.getBytes(UTF_8))},r=$serverNonce"
    val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
    val proof = xor(clientKey, hmac(storedKey, authMessage.getBytes(UTF_8)))
    sendToken(out, s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}")
    val serverFinal = readToken(in)
    if (serverFinal.startsWith("e="))
      throw new IllegalStateException(s"SASL authentication failed: $serverFinal")
    // mutual auth: the server proves it holds the credential
    val serverKey = hmac(sp, "Server Key".getBytes(UTF_8))
    val expected =
      Base64.getEncoder.encodeToString(hmac(serverKey, authMessage.getBytes(UTF_8)))
    if (!attrs(serverFinal).get('v').contains(expected))
      throw new IllegalStateException("server signature mismatch — not trusted")
  }
}
