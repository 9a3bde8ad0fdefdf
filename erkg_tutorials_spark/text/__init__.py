from erkg_tutorials_spark.text.quality import tokens, quality_scores, token_counts, fingerprints, language_id
