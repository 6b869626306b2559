package graft.filters.rubin

import graft.filters.AlertFilter

/** Rubin/LSST filter catalog — populated in a later milestone (SURVEY §2.5
  * Rubin table). Present now so the registry wiring is complete.
  */
object RubinFilters {
  val all: Seq[AlertFilter] = Seq.empty
  def load(): Unit = ()
}
