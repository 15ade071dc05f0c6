#!/usr/bin/env bash
# Regenerates src/main/scala/graft/BenchBars.scala from the FIRST
# per-query bar table in BASELINE.md (the authoritative current bars;
# later tables in the file are historical slope evidence). Run after
# any bar re-recording, then commit both files together.
set -euo pipefail
cd "$(dirname "$0")/.."

out=src/main/scala/graft/BenchBars.scala
{
  cat <<'EOF'
package graft

/** Per-query baseline bars (seconds) — GENERATED from BASELINE.md's
  * first bar table by scripts/gen_bench_bars.sh; do not hand-edit.
  * The bench uses these to (a) retry any row reading >= 2x its bar at
  * end-of-run regardless of probe state (the CPU cal probes provably
  * miss I/O-side bursts — round-11 forensics) and (b) emit a
  * breach-only per-query dict on the byte-budgeted stdout line.
  * Bars exist for sf0.1 and sf1 only; other scale dirs get no
  * bar-relative behavior. */
private[graft] object BenchBars {
EOF
  awk -F'|' '
    /^\| query \| sf0.1/ { t++ }
    t==1 && /^\| q_/ {
      gsub(/ /, "", $2); gsub(/ /, "", $3); gsub(/ /, "", $4)
      sf01 = sf01 sep "    \"" $2 "\" -> " $3
      sf1  = sf1  sep "    \"" $2 "\" -> " $4
      sep = ",\n"
    }
    END {
      print "  val sf01: Map[String, Double] = Map("
      print sf01 ")"
      print ""
      print "  val sf1: Map[String, Double] = Map("
      print sf1 ")"
    }
  ' BASELINE.md
  cat <<'EOF'

  def forSf(sfName: String): Map[String, Double] = sfName match {
    case "sf0.1" => sf01
    case "sf1"   => sf1
    case _       => Map.empty
  }
}
EOF
} > "$out"
echo "wrote $out ($(grep -c ' -> ' "$out") bar entries)"
