package graft.tables

import org.apache.hadoop.fs.{Path => HPath}

/** Store-specific atomic create-if-absent — the commit protocol's
  * winner election on object stores whose Hadoop
  * `create(overwrite=false)` is check-then-act rather than atomic.
  *
  * S3 is the motivating store (the reference deploys its Delta tables
  * on MinIO/S3 — bzkf/fhir-to-lakehouse src/lakehousekeeper.py:59–98,
  * compose.yaml): S3A implements `create(overwrite=false)` as a HEAD
  * probe followed by an unconditional PUT, so two racing writers can
  * both pass the probe and the second silently overwrites the first —
  * a lost commit. Real S3 (and MinIO) support conditional writes
  * (`If-None-Match: *`, S3 API since 2024-08): exactly-one PUT
  * succeeds at the store, the others get HTTP 412. A
  * [[org.apache.hadoop.fs.FileSystem]] that advertises this trait
  * routes [[ResourceTable]]'s elections through that primitive;
  * everything else about the table protocol is unchanged (the
  * election seam is `createExclusive`/`publishExclusive` — nothing
  * outside those two methods participates in elections).
  *
  * Contract: atomically create `p` with `body` iff `p` does not
  * exist. Returns true iff THIS call created it; false if `p` already
  * existed (HTTP 412 — lost election, nothing written). Must never
  * leave a partial object visible (single-PUT visibility: S3 objects
  * appear whole or not at all).
  */
trait ConditionalPut {
  def putIfAbsent(p: HPath, body: Array[Byte]): Boolean
}
