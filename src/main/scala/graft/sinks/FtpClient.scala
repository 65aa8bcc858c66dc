package graft.sinks

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Minimal RFC 959 FTP client (passive mode) — enough for the reference's
  * ftp-upload task (upload_if_newer, /root/reference/dasladen/task.py:453-456)
  * without an FTP library (none ships in the offline classpath).
  *
  * Supports: USER/PASS login, MDTM (remote mtime probe), STOR via PASV.
  */
final class FtpClient(host: String, port: Int, user: String, pass: String) {
  private val sock = new Socket(host, port)
  private val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.ISO_8859_1))
  private val out: OutputStream = sock.getOutputStream

  expect(220)
  cmd(s"USER $user", 331, 230) match {
    case 331 => cmd(s"PASS $pass", 230); ()
    case _   => ()
  }

  private def send(line: String): Unit = {
    out.write((line + "\r\n").getBytes(StandardCharsets.ISO_8859_1))
    out.flush()
  }

  private def readReply(): (Int, String) = {
    var line = in.readLine()
    if (line == null) throw new java.io.IOException("FTP connection closed")
    val code = line.take(3).toInt
    if (line.length > 3 && line.charAt(3) == '-') { // multi-line reply
      val terminator = line.take(3) + " "
      while (line != null && !line.startsWith(terminator)) line = in.readLine()
    }
    (code, line)
  }

  private def expect(codes: Int*): (Int, String) = {
    val (code, line) = readReply()
    if (!codes.contains(code))
      throw new java.io.IOException(s"FTP unexpected reply: $line (wanted ${codes.mkString("/")})")
    (code, line)
  }

  private def cmd(c: String, okCodes: Int*): Int = {
    send(c)
    expect(okCodes: _*)._1
  }

  /** Remote modification time in epoch millis; None if the file is absent. */
  def mdtm(path: String): Option[Long] = {
    send(s"MDTM $path")
    val (code, line) = readReply()
    if (code == 213) {
      // 213 YYYYMMDDHHMMSS
      val ts = line.drop(4).trim.take(14)
      val fmt = new java.text.SimpleDateFormat("yyyyMMddHHmmss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      Some(fmt.parse(ts).getTime)
    } else None
  }

  private def pasv(): Socket = {
    send("PASV")
    val (_, line) = expect(227)
    val nums = "\\d+".r.findAllIn(line.dropWhile(_ != '(')).map(_.toInt).toSeq
    val (h, p) = (nums.take(4).mkString("."), nums(4) * 256 + nums(5))
    new Socket(h, p)
  }

  def store(path: String, bytes: Array[Byte]): Unit = {
    cmd("TYPE I", 200)
    val data = pasv()
    try {
      send(s"STOR $path")
      expect(150, 125)
      data.getOutputStream.write(bytes)
      data.getOutputStream.flush()
    } finally data.close()
    expect(226, 250)
    ()
  }

  def close(): Unit = {
    try send("QUIT")
    catch { case _: Exception => () }
    sock.close()
  }
}
