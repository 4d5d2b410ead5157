package graft.functions

import org.apache.spark.sql.Column

/** Column-API entry points for graft's native string expressions (SQL
  * names are registered in GraftExtensions).
  */
object StringFns {

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Unicode NFC normalization (graft.functions.NfcNormalize). */
  def nfc(c: Column): Column = column(NfcNormalize(expression(c)))
}
