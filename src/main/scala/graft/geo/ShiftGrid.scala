package graft.geo

/** A datum shift grid (NTv2 .gsb, NADCON .las/.los, …): maps LOCAL-
  * datum geographic coordinates to the target datum and back. Degrees
  * in (lon east-positive, lat), degrees out; None outside coverage —
  * the engine's visible row-level policy for out-of-grid points.
  * Implementations must be Serializable (the parsed grid rides in a
  * UDF closure — broadcast-scale, never fact-scale). */
trait ShiftGrid extends Serializable {
  def forward(lonDeg: Double, latDeg: Double): Option[(Double, Double)]
  def inverse(lonDeg: Double, latDeg: Double): Option[(Double, Double)]
}
