package graft.llm

/** Production operating points for the tunable curation knobs — ONE
  * definition each, read by BOTH the production operators and the
  * tuning-sweep cards that price them (r17 verdict ask #5: the sweeps
  * measured the curves, but the operating points lived as separate
  * literals in the operators, so a knob could drift off its measured
  * frontier without any card noticing).
  *
  * The coupling is enforced twice: each sweep card `require`s its
  * grid CONTAINS the production point (a grid edit that orphans the
  * knob fails at plan build), and KnobsSpec asserts each point sits
  * on its card's measured frontier at sf0.001 (editing a knob without
  * re-running its card fails the build). The frontier evidence lives
  * with each card: q310 (span grid), q311 (screen curve), q314 (cap
  * curve).
  */
object Knobs {

  /** Span-removal gram length (Lee et al. 2022 family) — the q300/
    * q301 strip and the q50 shared-gram diagnostic. Priced by q310:
    * at (8, 2) the strip touches long verbatim spans at roughly half
    * the token cost of gramN=4 on this corpus (sf0.001: 9.7% vs
    * 19.1% of tokens), KnobsSpec-pinned under a 15% ceiling. */
  val SpanGramN = 8

  /** Span-removal blocklist threshold: a gram must occur at least
    * this many times to blocklist. 2 = "any repetition is verbatim
    * duplication" — the aggressive end of q310's measured minOcc
    * axis, safe at gramN 8 because 8-token collisions are essentially
    * always real duplication. */
  val SpanMinOcc = 2L

  /** LSH bucket cap for the capped near-dup pair pipelines (q49's
    * `maxBucketSize`). Priced by q314: at sf0.001/sf0.01 cap 3
    * already holds recall 1.0 against the exact truth, so 4 is
    * conservative — one step of headroom — while still saving the
    * boilerplate buckets' quadratic pair work. */
  val NearDupBucketCap = 4

  /** 1-bit Hamming screen threshold (ppm estimate) between band
    * candidacy and the exact cold-tier verify (q298). Priced by
    * q311: ~2.3 sd below the 0.5 admission threshold's bit-match
    * mean; the card measures the recall the screen costs next to the
    * cold-artifact reads it saves. */
  val BbitScreenPpm = 250000L
}
