package graft

/** Tag for the scale-canary suite: excluded from plain `sbt test` by the
  * build (a conditional `-l graft.Slow` in Test/testOptions), included
  * when sbt runs with `-Dgraft.slow=1` — see the `slowTest` alias. */
object Slow extends org.scalatest.Tag("graft.Slow")
