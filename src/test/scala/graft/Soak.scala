package graft

/** One knob for the nightly soak profile (FIXTURES.md): `GRAFT_SOAK=1`
  * raises every randomized in-suite leg to its off-suite soak strength
  * — kill-restart 8 statements × 2 cuts, statement fuzz 24 trials per
  * executor, batch statement fuzz 120/seed, NFA properties 10k
  * generations — without editing any test. The per-leg envs
  * (`GRAFT_FUZZ_TRIALS`, `GRAFT_NFA_GENS`, `GRAFT_PARITY_GENS`) still
  * win when set explicitly, and `GRAFT_FUZZ_SEED` composes for seed
  * diversification across nights.
  */
object Soak {
  val on: Boolean = sys.env.get("GRAFT_SOAK")
    .exists(v => v == "1" || v.equalsIgnoreCase("true"))

  /** The env override if set, else the soak strength under GRAFT_SOAK,
    * else the fast in-suite default. */
  def knob(env: String, default: Int, soak: Int): Int =
    sys.env.get(env).map(_.toInt)
      .getOrElse(if (on) soak else default)
}
