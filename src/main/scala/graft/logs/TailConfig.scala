package graft.logs

import org.apache.spark.sql.DataFrame

/** How lines from a source are interpreted — mirrors the reference's
  * per-tail `pattern` option (reference Worker.php:179-182):
  * `Default` = the stock monolog regex (Worker.php:25), `Custom` = a
  * user regex with the same six capture groups, `Raw` = the reference's
  * `'pattern' => false` mode (no parsing, line passed through).
  */
sealed trait PatternMode
object PatternMode {
  case object Default extends PatternMode
  final case class Custom(regex: String) extends PatternMode
  case object Raw extends PatternMode
}

/** Per-source tail configuration, mirroring one entry of the reference's
  * `tails` config array (reference readme.md config example;
  * Worker.php:56-66, 179-187).
  *
  * `transform` is the reference's per-line callback hook
  * (Worker.php:142-144) re-expressed as a declarative DataFrame
  * transform so it stays inside Catalyst instead of running
  * row-at-a-time.
  */
final case class TailConfig(
    name: String,
    repo: String,
    host: String = TailConfig.defaultHost,
    pattern: PatternMode = PatternMode.Default,
    transform: Option[DataFrame => DataFrame] = None,
    timestampFormat: String = "yyyy-MM-dd HH:mm:ss")

object TailConfig {
  /** The reference defaults `host` to `gethostname()` when unset
    * (Worker.php:148).
    */
  lazy val defaultHost: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: java.net.UnknownHostException => "unknown" }
}
