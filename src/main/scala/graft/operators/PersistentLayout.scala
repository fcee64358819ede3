package graft.operators

/** The ONE layout-format constant folded into every persistent /tmp cache
  * key (r15 VERDICT #6). The /tmp artifacts — d6/d9 shingle indexes, the
  * IVF index, the q_tar3/q_tar4 publish tables — outlive the JVM and are
  * keyed by content fingerprints (dataset dir, file size^mtime), so a
  * SCHEMA or DIRECTORY-LAYOUT change of the artifacts themselves used to
  * be invisible to the key: a new round's code could replay stale commits
  * against an old-layout table, or trust an old index whose format it no
  * longer reads (each past migration — the d6 v2 table move, the IVF
  * centroids-sidecar move — needed its own hand-written version bump,
  * and the tar publish tables had none at all). Folding this constant
  * into every md5 key makes the next migration a ONE-LINE bump here:
  * every old artifact is instantly unreachable (and reclaimed by /tmp
  * hygiene), none is ever reinterpreted.
  *
  * Bump whenever ANY persistent artifact's on-disk layout, schema, or
  * semantics change. Per-artifact `version` suffixes remain for bumps
  * scoped to one artifact family.
  */
private[graft] object PersistentLayout {
  val Fmt = "gl1"
}
