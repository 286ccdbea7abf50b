package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sync-mode gate + canonical-hash change detection
  * (reference A10–A13: sync_mode enum firebase/app/helpers.py:42-46,
  * gate artifacts.py:382-406, hash compare helpers.py:61-67).
  *
  * The reference stubs SYNC (artifacts.py:396-402) and has a falsy-
  * return bug in remote_msg_needs_update (helpers.py:61-67); we
  * implement the *intended* semantics — "write iff no stored hash or
  * hash changed" — as a left-anti join of the incoming batch against
  * the hash store on (id, hash). Documented deviation per SURVEY §7.4.
  *
  * At scale: the anti-join shuffles both sides on id unless the store
  * is broadcastable; with AQE on, Spark picks broadcast automatically
  * when the store is small. The store itself is maintained as a
  * parquet/Delta-style table upserted per micro-batch (see
  * streaming.Pipeline), never collected to the driver.
  */
object SyncGate {
  sealed trait SyncMode
  case object Sync extends SyncMode
  case object Forward extends SyncMode
  case object Consume extends SyncMode
  case object NoneMode extends SyncMode

  def parseMode(s: String): SyncMode = s.toLowerCase match {
    case "sync" => Sync
    case "forward" => Forward
    case "consume" => Consume
    case _ => NoneMode
  }

  /** Rows that need writing: no stored hash for id, or stored hash
    * differs. incoming must carry (idCol, hashCol). */
  def needsUpdate(incoming: DataFrame, hashStore: DataFrame,
                  idCol: String = "id", hashCol: String = "doc_hash"): DataFrame =
    incoming.join(hashStore.select(col(idCol), col(hashCol)),
      Seq(idCol, hashCol), "left_anti")

  /** Apply the sync-mode gate: NONE/CONSUME drop everything, FORWARD
    * passes all, SYNC anti-joins against the hash store. */
  def gate(incoming: DataFrame, mode: SyncMode, hashStore: => DataFrame,
           idCol: String = "id", hashCol: String = "doc_hash"): DataFrame =
    mode match {
      case Forward => incoming
      case Sync => needsUpdate(incoming, hashStore, idCol, hashCol)
      case _ => incoming.limit(0)
    }
}
