package graft

/** The reviewed exception list for [[tools.PlanAudit]]: every query
  * whose physical plan deliberately carries a flagged scale shape, with
  * the justification that bounds it at 100 TB. Keep justifications
  * specific — "small" is not a bound; "k rows by construction" is.
  * Populated by running the audit and reviewing each hit; a hit not
  * listed here fails the audit run.
  */
object PlanAuditExceptions {
  def all: Map[String, Map[String, String]] = Map.empty
}
