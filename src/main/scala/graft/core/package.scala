package graft

package object core {
  /** Existential analyzer type for heterogeneous collections / metric maps. */
  type AnyAnalyzer = Analyzer[_ <: State[_], _ <: Metric[_]]

  /** Existential scan-shareable analyzer type. */
  type AnyScanAnalyzer = ScanShareableAnalyzer[_ <: State[_], _ <: Metric[_]]
}
