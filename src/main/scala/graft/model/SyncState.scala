package graft.model

/** The `sync_file.processed` state machine.
  *
  * Decoded in `summary_report/pcs_summary_report.py:27-33`; transitions at
  * `staging_records_ingestion/file_loader.py:278 (3), :409 (2), :438 (-2)`.
  */
object SyncState {
  val JustUploaded: Int = 0
  val DecryptionQueue: Int = -1
  val Ready: Int = 1 // decrypted, awaiting ingest
  val Ingested: Int = 2
  val Failed: Int = -2
  val MissingOrPast: Int = 3 // file absent on disk: "loaded in the past"

  val All: Seq[Int] =
    Seq(JustUploaded, DecryptionQueue, Ready, Ingested, Failed, MissingOrPast)

  /** Human labels used in reports. */
  def label(s: Int): String = s match {
    case JustUploaded    => "just_uploaded"
    case DecryptionQueue => "decryption_queue"
    case Ready           => "decrypted_complete"
    case Ingested        => "processed"
    case Failed          => "failed"
    case MissingOrPast   => "loaded_in_the_past"
    case other           => s"unknown_$other"
  }

  /** Legal transitions (file_loader.py:272,278,409,438). A transition not
    * listed here is a pipeline bug, surfaced by tests.
    */
  def canTransition(from: Int, to: Int): Boolean = (from, to) match {
    case (JustUploaded, DecryptionQueue)    => true
    case (DecryptionQueue, Ready)           => true
    case (DecryptionQueue, Failed)          => true // real decryption fail
    case (Ready, Ingested)                  => true
    case (Ready, Failed)                    => true
    case (Ready, MissingOrPast)             => true
    case (Failed, Ready)                    => true // manual requeue
    case (Failed, Ingested)                 => true // retry succeeded
    case (f, t)                             => f == t
  }
}
