// CPU Aho-Corasick oracle — conformance ground truth at corpus scale.
//
// A third, independent matcher implementation (besides core/oracle.py's
// brute-force and dict-based walkers): classic goto/fail automaton with
// sparse per-node edge lists, walked with failure links (no dense DFA
// closure — deliberately a different construction than the framework's
// dense-table compiler so bugs can't be shared). Plays the ground-truth
// role BASELINE.json assigns to the reference's acsmx.c on the ClamAV
// conformance corpora.
//
// C ABI for ctypes. Symbols are generic int32 so the ushort (alphabet 2048)
// mode reuses the same oracle.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Node {
    // sorted (symbol, next) edge list; binary search on walk
    std::vector<std::pair<int32_t, int32_t>> edges;
    std::vector<int32_t> out;  // pattern indices ending here (closure)
    int32_t fail = 0;
};

struct Oracle {
    std::vector<Node> nodes;
    std::vector<int32_t> root_next;  // dense root row: the walk spends most
                                     // of its time at/near the root
    int32_t alphabet = 256;

    int32_t child(int32_t s, int32_t c) const {
        const auto &e = nodes[s].edges;
        size_t lo = 0, hi = e.size();
        while (lo < hi) {
            size_t mid = (lo + hi) / 2;
            if (e[mid].first < c)
                lo = mid + 1;
            else
                hi = mid;
        }
        if (lo < e.size() && e[lo].first == c) return e[lo].second;
        return -1;
    }

    void add_edge(int32_t s, int32_t c, int32_t t) {
        auto &e = nodes[s].edges;
        auto it = e.begin();
        while (it != e.end() && it->first < c) ++it;
        e.insert(it, {c, t});
    }
};

}  // namespace

extern "C" {

// Build from concatenated symbol arrays: patterns[i] occupies
// symbols[starts[i] .. starts[i] + lens[i]).
void *oracle_create(const int32_t *symbols, const int64_t *starts,
                    const int32_t *lens, int32_t n_patterns,
                    int32_t alphabet) {
    auto *o = new Oracle();
    o->alphabet = alphabet;
    o->nodes.emplace_back();
    for (int32_t p = 0; p < n_patterns; ++p) {
        int32_t s = 0;
        for (int32_t k = 0; k < lens[p]; ++k) {
            int32_t c = symbols[starts[p] + k];
            int32_t nxt = o->child(s, c);
            if (nxt < 0) {
                nxt = (int32_t)o->nodes.size();
                o->nodes.emplace_back();
                o->add_edge(s, c, nxt);
            }
            s = nxt;
        }
        o->nodes[s].out.push_back(p);
    }
    // dense root row (root has no fail link: missing symbol -> root)
    o->root_next.assign(alphabet, 0);
    for (auto &e : o->nodes[0].edges) o->root_next[e.first] = e.second;
    // BFS failure links + output closure
    std::vector<int32_t> queue;
    for (auto &e : o->nodes[0].edges) {
        o->nodes[e.second].fail = 0;
        queue.push_back(e.second);
    }
    for (size_t head = 0; head < queue.size(); ++head) {
        int32_t s = queue[head];
        for (auto &e : o->nodes[s].edges) {
            int32_t c = e.first, t = e.second;
            int32_t f = o->nodes[s].fail;
            while (f != 0 && o->child(f, c) < 0) f = o->nodes[f].fail;
            int32_t ft = o->child(f, c);
            o->nodes[t].fail = (ft >= 0 && ft != t) ? ft : 0;
            // output closure: inherit fail target's outputs
            const auto &inh = o->nodes[o->nodes[t].fail].out;
            auto &own = o->nodes[t].out;
            own.insert(own.end(), inh.begin(), inh.end());
            queue.push_back(t);
        }
    }
    return o;
}

void oracle_free(void *h) { delete static_cast<Oracle *>(h); }

// Walk `data` (int32 symbols) from state `*state_io`; append events
// (end_offset + offset_base, pattern_index) into out arrays up to `cap`.
// Returns the TOTAL number of events (may exceed cap); *state_io is
// updated to the final state so streams can be resumed.
int64_t oracle_match(void *h, const int32_t *data, int64_t n,
                     int64_t offset_base, int32_t *state_io,
                     int64_t *out_off, int32_t *out_pid, int64_t cap) {
    auto *o = static_cast<Oracle *>(h);
    const int32_t *root = o->root_next.data();
    int32_t s = *state_io;
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t c = data[i];
        if (c < 0 || c >= o->alphabet) {  // out-of-alphabet symbol: no
            s = 0;                        // pattern can contain it
            continue;
        }
        int32_t nxt;
        if (s == 0) {
            nxt = root[c];
        } else {
            nxt = o->child(s, c);
            while (nxt < 0 && s != 0) {
                s = o->nodes[s].fail;
                nxt = s == 0 ? root[c] : o->child(s, c);
            }
            if (nxt < 0) nxt = 0;
        }
        s = nxt;
        for (int32_t pid : o->nodes[s].out) {
            if (total < cap) {
                out_off[total] = offset_base + i;
                out_pid[total] = pid;
            }
            ++total;
        }
    }
    *state_io = s;
    return total;
}

// Byte-specialized walk (uint8 input) to avoid int32 widening on big corpora.
int64_t oracle_match_bytes(void *h, const uint8_t *data, int64_t n,
                           int64_t offset_base, int32_t *state_io,
                           int64_t *out_off, int32_t *out_pid, int64_t cap) {
    auto *o = static_cast<Oracle *>(h);
    const int32_t *root = o->root_next.data();
    int32_t s = *state_io;
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t c = data[i];
        if (c >= o->alphabet) {
            s = 0;
            continue;
        }
        int32_t nxt;
        if (s == 0) {
            nxt = root[c];
        } else {
            nxt = o->child(s, c);
            while (nxt < 0 && s != 0) {
                s = o->nodes[s].fail;
                nxt = s == 0 ? root[c] : o->child(s, c);
            }
            if (nxt < 0) nxt = 0;
        }
        s = nxt;
        if (!o->nodes[s].out.empty()) {
            for (int32_t pid : o->nodes[s].out) {
                if (total < cap) {
                    out_off[total] = offset_base + i;
                    out_pid[total] = pid;
                }
                ++total;
            }
        }
    }
    *state_io = s;
    return total;
}

}  // extern "C"
