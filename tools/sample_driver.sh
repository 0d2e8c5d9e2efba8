#!/bin/bash
# Sample the newest Spark driver JVM's main thread with jstack while a
# profile run executes, and histogram the deepest graft/spark frames.
# Usage: tools/sample_driver.sh <seconds> <hz> <outfile>
secs=${1:-30}; hz=${2:-5}; out=${3:-/tmp/driver_samples.txt}
: > "$out"
end=$((SECONDS + secs))
while [ $SECONDS -lt $end ]; do
  pid=$(jps -l 2>/dev/null | grep -v sbt-launch | grep -v Jps | awk '{print $1}' | head -1)
  # the sbt in-process run: the driver IS the sbt JVM; fall back to it
  if [ -z "$pid" ]; then pid=$(jps -l 2>/dev/null | grep sbt-launch | awk '{print $1}' | head -1); fi
  [ -n "$pid" ] && jstack "$pid" 2>/dev/null >> "$out" && echo "---SAMPLE---" >> "$out"
  sleep $(python3 -c "print(1.0/$hz)")
done
echo "samples: $(grep -c SAMPLE "$out")"
