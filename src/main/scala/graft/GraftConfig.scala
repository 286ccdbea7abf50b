package graft

/** Layered settings loader (reference A27: JSON file + env vars with
  * key aliasing, firebase/app/config.py:65-108 — e.g.
  * BOOTSTRAP.SERVERS aliased to KAFKA_URL). Precedence: explicit
  * overrides > environment > defaults; keys are case-insensitive with
  * '.'/'_' folded, matching the reference's env-var munging. */
final case class GraftConfig(
    defaults: Map[String, String] = Map.empty,
    env: Map[String, String] = sys.env,
    overrides: Map[String, String] = Map.empty,
    aliases: Map[String, String] = Map("bootstrap.servers" -> "kafka.url")) {

  private def norm(k: String): String = k.toLowerCase.replace('_', '.')

  def get(key: String): Option[String] = {
    val k = norm(key)
    val keys = Seq(k) ++ aliases.get(k)
    def lookup(m: Map[String, String]): Option[String] =
      keys.flatMap(kk => m.collectFirst { case (mk, v) if norm(mk) == kk => v }).headOption
    lookup(overrides).orElse(lookup(env)).orElse(lookup(defaults))
  }

  def getOrElse(key: String, default: String): String = get(key).getOrElse(default)
}
