#!/usr/bin/env python3
"""Golden-fixture generator: dependency-free (no torch) port of the reference's
PyramidLabelEncoder / SigmoidMultiLabelEncoder algorithmic semantics
(/root/reference/pyramid_nested_ner/vectorizers/labels/__init__.py and
multi_label_encoder.py) plus the parse-assembly char-offset math
(/root/reference/pyramid_nested_ner/model.py:153-166).

Torch is used by the reference only as an array container in these code
paths, so a pure-list port re-derives identical outputs. One deliberate
deviation, standardized across this repo (SURVEY.md §7 "hard parts"): the
entity dictionary is SORTED (the reference single-label fit iterates a
Python set -> nondeterministic class ids; the multi-label variant already
sorts).

Output: src/test/resources/golden/decode_cases.json, asserted by
LabelCodecGoldenSpec. Deterministic: fixed cases, no randomness, no clock.
"""
import json, os

def tokenize(text):
    return text.split()

class SingleCodec:
    """Port of PyramidLabelEncoder with sorted entity dictionary."""
    def __init__(self, kinds):
        self.entities = [None] + sorted(set(kinds))
        # reference iob2 order (labels/__init__.py:29): I-e, B-e per entity
        self.iob2 = [f'{p}-{e}' for e in self.entities for p in 'IB' if e]

    def ngram_count(self, n_tokens, order):
        return max(0, n_tokens - order + 1)

    def tok_span(self, text, ent):
        # labels/__init__.py:83-84 — canonical char->token rule
        start = len(tokenize(text[:ent['start']]))
        stop = start + len(tokenize(ent['value']))
        return start, stop

    def layer(self, dp, order):
        text, ents = dp['text'], dp['entities']
        n = self.ngram_count(len(tokenize(text)), order)
        out = []
        for i in range(n):
            cls = 0
            for ent in ents:  # first match wins (break — :88)
                es, ee = self.tok_span(text, ent)
                if es == i and ee == i + order:
                    cls = self.entities.index(ent['name'])
                    break
            out.append(cls)
        return out

    def remedy(self, dp, order):
        text, ents = dp['text'], dp['entities']
        n = self.ngram_count(len(tokenize(text)), order)
        rows = []
        for i in range(n):
            tags = []
            for ent in ents:
                es, ee = self.tok_span(text, ent)
                if i >= es and i + order <= ee:
                    tags.append(('B-' if es == i else 'I-') + ent['name'])
            rows.append(sorted(set(tags)))
        return rows

    def transform(self, dp, max_depth):
        layers, remedy = [], None
        for l in range(max_depth):
            y = self.layer(dp, l + 1)
            if y:
                layers.append(y)
            else:
                break
        if len(layers) == max_depth:
            r = self.remedy(dp, max_depth + 1)
            if r:
                remedy = r
        return layers, remedy

    def inverse_layers(self, layers):
        # labels/__init__.py:182-187
        return [[f'B-{self.entities[c]}' if c else 'O' for c in y] for y in layers]

    def inverse_remedy(self, rows):
        # labels/__init__.py:137-180, batch of one sequence
        def has(row, tag):
            return tag in row

        def recover_len(offset, entity):
            ln = 1
            for row in rows[offset + 1:]:
                if has(row, f'I-{entity}'):
                    ln += 1
                else:
                    break
            return ln

        longest, seq_tags = 0, {}
        for offset, row in enumerate(rows):
            for entity in self.entities[1:]:
                if has(row, f'B-{entity}'):
                    ln = recover_len(offset, entity)
                    if ln not in seq_tags:
                        seq_tags[ln] = ['O'] * (len(rows) - (ln - 1))
                    if seq_tags[ln][offset] == 'O':
                        seq_tags[ln][offset] = f'B-{entity}'
                        longest = max(ln, longest)
                    else:
                        seq_tags[ln][offset] = None  # conflict: both discarded
        out = []
        for i in range(1, longest + 1):
            n = max(0, len(rows) - (i - 1))
            if i in seq_tags:
                out.append([t or 'O' for t in seq_tags[i]])
            else:
                out.append(['O'] * n)
        return out

    def parse_assembly(self, text, labels):
        # model.py:153-166 (l-th label list => token length l+1)
        tokens = text.split()
        entities = []
        for l, sequence in enumerate(labels):
            for token, tag in enumerate(sequence):
                if tag == 'O':
                    continue
                name = tag[2:]
                value = " ".join(tokens[token:token + l + 1])
                stop = len(" ".join(tokens[:token + l + 1]))
                start = stop - len(value)
                entities.append({'name': name, 'value': value, 'start': start,
                                 'stop': stop, 'startTok': token, 'lenTok': l + 1})
        return entities

class MultiCodec(SingleCodec):
    """Port of SigmoidMultiLabelEncoder (sorted entities; B,I iob2 order)."""
    def __init__(self, kinds):
        self.entities = sorted(set(kinds))
        self.iob2 = [f'{p}-{e}' for e in self.entities for p in 'BI' if e]

    def layer(self, dp, order):
        text, ents = dp['text'], dp['entities']
        n = self.ngram_count(len(tokenize(text)), order)
        out = []
        for i in range(n):
            names = []
            for ent in ents:  # no break — multi-label
                es, ee = self.tok_span(text, ent)
                if es == i and ee == i + order and ent['name'] not in names:
                    names.append(ent['name'])
            out.append(sorted(names))
        return out

    def transform(self, dp, max_depth):
        layers = []
        n_tok = len(tokenize(dp['text']))
        for l in range(max_depth):
            if self.ngram_count(n_tok, l + 1) == 0:
                break
            layers.append(self.layer(dp, l + 1))
        remedy = None
        if len(layers) == max_depth:
            r = self.remedy(dp, max_depth + 1)
            if r:
                remedy = r
        return layers, remedy

    def inverse_remedy(self, rows):
        # multi_label_encoder.py:63-134, one sequence; returns spans
        # [(name, start_row, run_len)] ordered run-len asc, start asc,
        # kind-major per first-flush order within a slot.
        sequence_entities = {}  # name -> [[s,e],...] (insertion ordered)
        current = {e: [] for e in self.entities}
        previous = {e: False for e in self.entities}
        for offset, row in enumerate(rows):
            begin = {e: (f'B-{e}' in row) for e in self.entities}
            inside = {e: (f'I-{e}' in row) and previous[e] for e in self.entities}
            for e in self.entities:
                if begin[e]:
                    current[e].append([offset, offset + 1])
            for e in self.entities:
                if inside[e]:
                    for sp in current[e]:
                        sp[1] = offset + 1
            previous = {e: begin[e] or inside[e] for e in self.entities}
            for e in self.entities:
                if not previous[e] and current[e]:
                    sequence_entities.setdefault(e, []).extend(current[e])
                    current[e] = []
        for e in self.entities:
            if current[e]:
                sequence_entities.setdefault(e, []).extend(current[e])
        # _decode_labels ordering
        slots = {}
        order = []
        for name, spans in sequence_entities.items():
            for s, e in spans:
                order.append((e - s, s, name))
        out = []
        for run_len in sorted(set(t[0] for t in order)):
            group = [t for t in order if t[0] == run_len]
            group.sort(key=lambda t: (t[1], order.index(t)))
            out.extend(group)
        return out

TOK = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
       "lam mu nu xi omicron pi rho sigma tau upsilon").split()

def mk_dp(n_tokens, ent_specs, weird_ws=False):
    tokens = [TOK[i % len(TOK)] for i in range(n_tokens)]
    if weird_ws:
        text = "  " + "   ".join(tokens) + " "
    else:
        text = " ".join(tokens)
    ents = []
    for name, st, ln in ent_specs:
        # char offsets into the RAW text
        idx, pos = 0, 0
        starts = []
        for tk in tokens:
            p = text.index(tk, pos)
            starts.append(p)
            pos = p + len(tk)
        start = starts[st]
        stop = starts[st + ln - 1] + len(tokens[st + ln - 1])
        ents.append({'name': name, 'value': text[start:stop], 'start': start, 'stop': stop})
    return {'text': text, 'entities': ents}

KINDS = ['DNA', 'RNA', 'protein', 'cell_line', 'cell_type']

cases = []
def add_case(cid, dp, max_depth, kinds=KINDS):
    sc, mc = SingleCodec(kinds), MultiCodec(kinds)
    layers, remedy = sc.transform(dp, max_depth)
    labels = sc.inverse_layers(layers)
    if remedy is not None:
        labels = labels + sc.inverse_remedy(remedy)
    decoded = sc.parse_assembly(" ".join(tokenize(dp['text'])), labels)
    mlayers, mremedy = mc.transform(dp, max_depth)
    mspans = []
    for l, y in enumerate(mlayers):
        for i, names in enumerate(y):
            for nm in names:
                mspans.append({'name': nm, 'startTok': i, 'lenTok': l + 1})
    if mremedy is not None:
        for run_len, s, nm in mc.inverse_remedy(mremedy):
            mspans.append({'name': nm, 'startTok': s, 'lenTok': max_depth + run_len})
    cases.append({
        'id': cid, 'kinds': kinds, 'maxDepth': max_depth,
        'text': dp['text'], 'entities': dp['entities'],
        'layers': layers, 'remedy': remedy,
        'multiLayers': mlayers, 'multiRemedy': mremedy,
        'decoded': decoded, 'multiDecoded': mspans,
    })

# 1. flat entities within depth
add_case('flat_basic', mk_dp(9, [('protein', 1, 1), ('DNA', 4, 2)]), 4)
# 2. nested: outer len 3 contains inner len 1; depth 2 -> outer via remedy (run 1)
add_case('nested_remedy_edge', mk_dp(8, [('DNA', 2, 3), ('protein', 3, 1)]), 2)
# 3. long entity len depth+3 (remedy run of 3)
add_case('remedy_long', mk_dp(12, [('RNA', 2, 7), ('protein', 0, 1)]), 4)
# 4. remedy conflict: two kinds, same span, len depth+1 -> both discarded
add_case('remedy_conflict', mk_dp(10, [('DNA', 3, 5), ('RNA', 3, 5)]), 4)
# 5. same-span two kinds within depth: single-label first-wins, multi-label both
add_case('layer_overlap', mk_dp(7, [('DNA', 2, 2), ('RNA', 2, 2)]), 4)
# 6. early cutoff: 3 tokens, depth 8
add_case('early_cutoff', mk_dp(3, [('protein', 0, 2)]), 8)
# 7. no entities
add_case('empty', mk_dp(6, []), 3)
# 8. irregular whitespace in raw text (char offsets computed on raw text)
add_case('weird_ws', mk_dp(8, [('cell_line', 1, 2), ('DNA', 1, 4)], weird_ws=True), 3)
# 9. adjacent same-kind remedy entities (multi-label I-extension quirk)
add_case('remedy_adjacent', mk_dp(14, [('protein', 0, 5), ('protein', 5, 5)]), 4)
# 10. overlapping remedy spans same kind, different starts
add_case('remedy_overlap_same_kind', mk_dp(14, [('DNA', 1, 6), ('DNA', 3, 6)]), 4)
# 11. exactly seq-len entity + seq shorter than depth+1
add_case('full_seq_entity', mk_dp(5, [('cell_type', 0, 5)]), 4)
# 12. depth 1 pyramid with len-2 entity (remedy run 1 at depth 1)
add_case('depth1', mk_dp(6, [('RNA', 2, 2), ('DNA', 4, 1)]), 1)

out_dir = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'golden')
os.makedirs(out_dir, exist_ok=True)
path = os.path.join(out_dir, 'decode_cases.json')
with open(path, 'w') as f:
    json.dump(cases, f, indent=1, sort_keys=True)
print(f'wrote {len(cases)} cases -> {path}')
