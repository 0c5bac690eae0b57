package graft.etl

/** Bug-compat switches for the reference's behavioral quirks
  * (SURVEY.md §2.10). Defaults are the FIXED semantics; `referenceCompat`
  * reproduces the committed outputs bit-for-bit for golden-diff testing.
  *
  *   - B2 `fillI94ModeWithZero`: the reference comments "fill 9 (Not
  *     reported)" but fills 0 (etl.py:170-171), creating 239 fact rows
  *     with an FK that matches no transportation mode. Fixed: fill 9.
  *   - B3 `caseMismatchedCountryJoin`: reference upper-cases temperature
  *     country but lower-cases the lookup side (etl.py:212,218), so the
  *     join never matches. Fixed: normalize both sides identically.
  *   - B5 `nullSasEpochZero`: reference's UDF nulls SAS day 0
  *     (1960-01-01, a legitimate date — etl.py:255). Fixed: 0 is valid.
  */
final case class CompatConfig(
    fillI94ModeWithZero: Boolean = false,
    caseMismatchedCountryJoin: Boolean = false,
    nullSasEpochZero: Boolean = false)

object CompatConfig {
  val fixed: CompatConfig = CompatConfig()
  val referenceCompat: CompatConfig = CompatConfig(
    fillI94ModeWithZero = true,
    caseMismatchedCountryJoin = true,
    nullSasEpochZero = true)
}
