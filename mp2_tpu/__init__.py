"""mp2-tpu: a TPU-native zkSNARK proving framework.

A from-scratch, TPU-first (JAX/XLA/Pallas) re-design of the capabilities of
``Lagrange-Labs/mapreduce-plonky2`` (reference at /root/reference): a
plonky2-class recursive proving stack for the Lagrange ZK-SQL coprocessor.

Layer map (mirrors reference SURVEY.md §1, re-architected for TPU):

  mp2_tpu.field      Goldilocks GF(p), GF(p^2), GF(p^5), EcGFp5 curve
                     (vectorized u32-pair arithmetic; VPU/MXU friendly)
  mp2_tpu.hash       Poseidon2 permutation/sponge, keccak256 (host witness gen),
                     duplex challenger (Fiat-Shamir transcript)
  mp2_tpu.ops        Pallas TPU kernels for the prover hot loops
                     (NTT butterflies, Poseidon2 throughput, Merkle levels)
  mp2_tpu.prover     NTT/LDE, Merkle-cap commitment, FRI, plonky2-shaped
                     prove/verify  (reference layer 0: plonky2 crate)
  mp2_tpu.circuit    CircuitBuilder, gates, gadgets (u256, array, rlp, mpt,
                     keccak, storage slots, group hashing)
                     (reference layer 1: mp2-common)
  mp2_tpu.recursion  fixed-VK circuit-set aggregation engine
                     (reference layer 2: recursion-framework)
  mp2_tpu.extraction Ethereum state extraction circuits
                     (reference layer 3: mp2-v1)
  mp2_tpu.vdb        verifiable-DB construction + query + revelation circuits
                     (reference layer 4: verifiable-db)
  mp2_tpu.ryhope     epoch-versioned Merkle-tree KV store, update-tree
                     proving workplans (reference layer 5: ryhope)
  mp2_tpu.parsil     SQL front-end: parse/validate/assemble to circuit PIs
                     (reference layer 6: parsil)
  mp2_tpu.parallel   device-mesh map-reduce proof scheduling (shard_map /
                     collectives over ICI; host DAG scheduler)
  mp2_tpu.models     flagship end-to-end pipelines (leaf prover, aggregator)
  mp2_tpu.utils      serialization, rlp (host), eth MPT trie fixtures
"""

__version__ = "0.1.0"
