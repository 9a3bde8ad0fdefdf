from erkg_tutorials_spark.dedup.exact import exact_dedup
from erkg_tutorials_spark.dedup.minhash import shingles, minhash_signature, lsh_candidate_pairs, minhash_lsh_dedup
