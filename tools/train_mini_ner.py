"""Train the vendored mini-NER perceptron and write its weight file.

    python tools/train_mini_ner.py

Deterministic (fixed shuffle seed): re-running reproduces
``erkg_tutorials_spark/text/data/mini_ner_weights.json``
byte-identically, so the vendored weights are auditable — anyone can
regenerate them from this corpus.

The corpus: whitespace-tokenized sentences with (start, end_exclusive,
LABEL) token-span annotations, flavored like the engine's domain —
offshore-leaks-style persons/shells (the reference links ICIJ
articles), fixture-corpus names used by the linking goldens, and
negative sentences so "O" dominates where it should.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erkg_tutorials_spark.text.mini_ner import MiniNER, save_weights, train  # noqa: E402

# (text, [(start_tok, end_tok_exclusive, LABEL), ...])
CORPUS: list[tuple[str, list[tuple[int, int, str]]]] = [
    ("Investigative reporter Khadija Ismayilova met Barack Obama at the offices of Londex Resources S.A. last spring .",
     [(2, 4, "PERSON"), (5, 7, "PERSON"), (11, 14, "ORG")]),
    ("Khadija Ismayilova published the report from Baku yesterday .",
     [(0, 2, "PERSON"), (6, 7, "GPE")]),
    ("Barack Obama spoke in Washington about the findings .",
     [(0, 2, "PERSON"), (4, 5, "GPE")]),
    ("The shell company Fairfield Trading Ltd. was registered in Panama .",
     [(3, 6, "ORG"), (9, 10, "GPE")]),
    ("Documents tie Globex Holdings Inc. to accounts in Cyprus and Malta .",
     [(2, 5, "ORG"), (8, 9, "GPE"), (10, 11, "GPE")]),
    ("Mr. John Smith resigned from Acme Corp. on Monday .",
     [(0, 3, "PERSON"), (5, 7, "ORG")]),
    ("Dr. Maria Lopez advised Quantum Partners LLC in London .",
     [(0, 3, "PERSON"), (4, 7, "ORG"), (8, 9, "GPE")]),
    ("Prosecutors in Azerbaijan questioned the journalist .",
     [(2, 3, "GPE")]),
    ("The leak exposed Mossfon Nominees N.V. and its directors .",
     [(3, 6, "ORG")]),
    ("Elena Petrova wired funds to Horizon Ventures GmbH from Riga .",
     [(0, 2, "PERSON"), (5, 8, "ORG"), (9, 10, "GPE")]),
    ("A subsidiary of Northbridge Capital Corp. operated in Luxembourg .",
     [(3, 6, "ORG"), (8, 9, "GPE")]),
    ("Ms. Aisha Aliyeva chaired the board of Caspian Energy PLC .",
     [(0, 3, "PERSON"), (7, 10, "ORG")]),
    ("Reporters traced the trust to Geneva and Zurich .",
     [(5, 6, "GPE"), (7, 8, "GPE")]),
    ("Sir David Brown founded Brown Brothers Ltd. in 1984 .",
     [(0, 3, "PERSON"), (4, 7, "ORG")]),
    ("The filings name Pavel Novak as the beneficial owner .",
     [(3, 5, "PERSON")]),
    ("Offshore agents incorporated Sunrise Trading S.A. in the Seychelles .",
     [(3, 6, "ORG"), (8, 9, "GPE")]),
    ("President Ilham Aliyev denied the allegations .",
     [(0, 3, "PERSON")]),
    ("The quick brown fox jumps over the lazy dog .", []),
    ("Nothing in the ledger suggested wrongdoing .", []),
    ("Auditors reviewed the accounts last quarter .", []),
    ("Shares of Vertex Mining AG fell sharply in Frankfurt .",
     [(2, 5, "ORG"), (8, 9, "GPE")]),
    ("Anar Mammadov owns a villa near Dubai .",
     [(0, 2, "PERSON"), (6, 7, "GPE")]),
    ("The consortium included Delta Shipping Co. and Omega Freight Inc. .",
     [(3, 6, "ORG"), (7, 10, "ORG")]),
    ("Mrs. Carla Mendes represented the fund in Lisbon .",
     [(0, 3, "PERSON"), (7, 8, "GPE")]),
    ("Leaked emails mention Viktor Orban and Budapest repeatedly .",
     [(3, 5, "PERSON"), (6, 7, "GPE")]),
    ("The foundation moved assets through Atlas Fiduciary Ltd. quietly .",
     [(5, 8, "ORG")]),
    ("Statements from Deutsche Vermoegen GmbH surfaced in Berlin .",
     [(2, 5, "ORG"), (7, 8, "GPE")]),
    ("Her cousin Leyla Yunus was detained in Baku .",
     [(2, 4, "PERSON"), (7, 8, "GPE")]),
    ("Analysts doubted the numbers in the annual report .", []),
    ("Pacific Rim Holdings PLC listed bearer shares in Tortola .",
     [(0, 4, "ORG"), (8, 9, "GPE")]),
    ("Journalist Miranda Patrucic traced payments to Podgorica .",
     [(1, 3, "PERSON"), (6, 7, "GPE")]),
    ("The registry lists Stellar Nominees LLC as shareholder .",
     [(3, 6, "ORG")]),
    ("Tomas Eriksson met Ingrid Larsson in Stockholm .",
     [(0, 2, "PERSON"), (3, 5, "PERSON"), (6, 7, "GPE")]),
    ("Funds flowed from Riyadh through Crescent Trade Corp. to Amman .",
     [(3, 4, "GPE"), (5, 8, "ORG"), (9, 10, "GPE")]),
    ("No entities appear in this sentence at all .", []),
    ("Its drivers delivered packages across the region .", []),
    ("Mr. Omar Haddad advised Falcon Estates S.A. from Beirut .",
     [(0, 3, "PERSON"), (4, 7, "ORG"), (8, 9, "GPE")]),
    ("The witness named Sergei Volkov under oath .",
     [(3, 5, "PERSON")]),
    ("Meridian Capital N.V. financed the pipeline near Tbilisi .",
     [(0, 3, "ORG"), (7, 8, "GPE")]),
    ("She visited Panama City before the story ran .",
     [(2, 4, "GPE")]),
    ("Interpol flagged Nadir Guliyev at the border .",
     [(2, 4, "PERSON")]),
    ("The trustee, based in Valletta , administered Harbor Trust Ltd. .",
     [(4, 5, "GPE"), (7, 10, "ORG")]),
]


def main() -> None:
    model = train(CORPUS, n_iter=8, seed=0)
    save_weights(model)
    # quick self-check: every training entity must be recovered
    # (training-set fit is the floor for a model this size)
    ner = MiniNER(model)
    missed = []
    for text, ents in CORPUS:
        toks = text.split(" ")
        got = {(e.start, e.end, e.label_) for e in ner._decode(text).ents}
        for s, e, lab in ents:
            if (s, e, lab) not in got:
                missed.append((" ".join(toks[s:e]), lab, text))
    print(f"trained on {len(CORPUS)} sentences; "
          f"{sum(len(e) for _, e in CORPUS)} entities; missed {len(missed)}")
    for m in missed:
        print("  MISS", m)


if __name__ == "__main__":
    main()
