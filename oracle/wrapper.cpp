// Test-oracle wrapper around the reference SpeedBlocks game engine.
//
// This file is OUR code; it compiles the reference's pure game sources
// (gamePlay/gameField/pieces/Combo/Garbage/DropDelay/randomizer/TestField,
// taken read-only from /root/reference at build time — see build.sh) into a
// shared library with a C ABI that tests drive via ctypes.  The pybind11
// layer (PythonHandle.cpp) is NOT compiled — it needs the vendored, Python-
// 3.12-incompatible pybind11 — so the few lines of multiplayer orchestration
// it contains (make_actions / finish_actions / distributeLines,
// PythonHandle.cpp:73-190) are replicated here verbatim-in-spirit, with one
// deliberate deviation: action_finish falls off the end of a bool function
// when lines were sent (UB in the reference); we define that case as
// "no death, no break".
//
// Used only by the parity test-suite; never shipped, never on any hot path.

#include <cstdint>
#include <cstring>
#include <vector>

#include "gamePlay.h"
#include "gameField.h"

namespace {

std::vector<GamePlay> g_players;
bool g_round_over = false;
bool g_check_winner = false;
int g_last_winner = -1;

void action_make(int player, int action) {
    GamePlay& game = g_players[player];
    switch (action) {
        case 1: game.field.mLeft(); break;
        case 2: while (game.field.mLeft()); break;
        case 3: game.field.mRight(); break;
        case 4: while (game.field.mRight()); break;
        case 5: game.mDown(); break;
        case 6: while (game.mDown()); break;
        case 7: game.hd_make(); break;
        case 8: game.field.rcw(); break;
        case 9: game.field.rccw(); break;
        case 10: game.field.r180(); break;
        default: break;
    }
}

void distributeLines(int sender, int amount) {
    float number_of_players = (float)g_players.size() - 1;
    if (number_of_players < 1) return;
    float amount_per_player = amount / number_of_players;
    int count = -1;
    for (auto& player : g_players) {
        ++count;
        if (count == sender) continue;
        player.incoming_lines += amount_per_player;
    }
}

// PythonHandle::action_finish with the UB return defined as false.
bool action_finish(int player) {
    int sent = g_players[player].hd_finish();
    if (sent == -1) return true;
    else if (!sent) return false;
    distributeLines(player, sent);
    return false;
}

}  // namespace

extern "C" {

void oracle_set_pieces(const uint8_t* map7) {
    std::array<uint8_t, 7> a;
    bool only = true;
    for (int i = 0; i < 7; ++i) {
        a[i] = map7[i];
        if (a[i] != 2 && a[i] != 3) only = false;
    }
    GamePlay::randomizer_map = a;
    GamePlay::only_zs = only;
}

void oracle_reset(int seed1, int seed2) {
    g_round_over = false;
    int player_count = -1, winner = -1, alive_count = 0;
    for (auto& player : g_players) {
        ++player_count;
        if (!player.dead) { ++alive_count; winner = player_count; }
        player.restartRound();
    }
    g_last_winner = winner;
    if (!player_count) g_last_winner = 0;
    if (alive_count > 1) g_last_winner = -1;
    for (auto& player : g_players) player.seed(seed1, seed2);
}

void oracle_init(int height, int width, int n_players, int seed1, int seed2) {
    FIELD_HEIGHT = height;
    FIELD_WIDTH = width;
    g_players.clear();
    g_players.resize(n_players);
    g_check_winner = n_players > 1;
    for (auto& player : g_players) player.restartRound();
    for (auto& player : g_players) player.seed(seed1, seed2);
    g_round_over = false;
    g_last_winner = -1;
}

// keys: n_players * keys_per_player ints, 0-padded.  Returns round_over.
int oracle_step(const int* keys, int keys_per_player, int dt) {
    if (g_round_over) return 1;
    // make_actions (PythonHandle.cpp:138-147)
    for (unsigned i = 0; i < g_players.size(); ++i) {
        if (!g_players[i].dead) {
            for (int k = 0; k < keys_per_player; ++k)
                action_make(i, keys[i * keys_per_player + k]);
        }
    }
    // finish_actions (PythonHandle.cpp:149-188)
    for (unsigned i = 0; i < g_players.size(); ++i) {
        if (!g_players[i].dead) {
            if (action_finish(i)) { g_players[i].dead = true; break; }
        }
    }
    int alive_count = 0;
    int player_count = -1;
    for (auto& player : g_players) {
        ++player_count;
        if (player.dead) continue;
        int sent = player.delayCheck(dt);
        if (sent == -1) {
            player.dead = true;
            continue;
        } else if (sent)
            distributeLines(player_count, sent);
        if (!player.dead) alive_count++;
        player.reward = player.data.linesCleared - player.linesCleared;
        player.linesCleared = player.data.linesCleared;
        player.incoming_lines_count = player.garbage.count();
    }
    if ((g_check_winner && alive_count < 2) || !alive_count) {
        g_round_over = true;
        return 1;
    }
    return 0;
}

int oracle_last_winner() { return g_last_winner; }
int oracle_round_over() { return g_round_over ? 1 : 0; }

// Flat per-player state dump for comparison with the JAX engine.
void oracle_dump_player(int p, uint8_t* field /*H*W*/, int* scalars /*>=24*/,
                        float* floats /*>=9*/) {
    GamePlay& g = g_players[p];
    std::memcpy(field, g.field.square.data(), FIELD_WIDTH * FIELD_HEIGHT);
    int i = 0;
    scalars[i++] = g.field.piece.piece;
    scalars[i++] = g.field.piece.current_rotation;
    scalars[i++] = g.field.piece.posX;
    scalars[i++] = g.field.piece.posY;
    scalars[i++] = g.nextpiece;
    scalars[i++] = g.time_ms;
    scalars[i++] = g.dead;
    scalars[i++] = g.reward;
    scalars[i++] = g.data.linesCleared;
    scalars[i++] = g.data.linesSent;
    scalars[i++] = g.data.garbageCleared;
    scalars[i++] = g.data.linesBlocked;
    scalars[i++] = g.data.maxCombo;
    scalars[i++] = g.incoming_lines_count;
    scalars[i++] = g.combo.comboCount;
    scalars[i++] = g.combo.remaining;
    scalars[i++] = (int)g.garbage.garbage.size();
    scalars[i++] = g.garbage.count();
    scalars[i++] = g.garbage.minRemaining;
    scalars[i++] = g.dropDelay.dropDelay;
    scalars[i++] = g.dropDelay.dropDelayTime;
    scalars[i++] = g.dropDelay.lockdown ? 1 : 0;
    scalars[i++] = g.dropDelay.lockdownTime;
    scalars[i++] = g.linesCleared;  // snapshot
    int j = 0;
    floats[j++] = g.incoming_lines;
    for (int k = 0; k < 7; ++k) floats[j++] = g.rander.cogP[k];
    floats[j++] = 0.f;
}

// Mask/action-list dump: runs TestField::getMask(2) for player p.
// Returns number of actions; writes each action's key codes (terminated by
// -1) into out, max_actions rows of max_len ints.
int oracle_get_actions(int p, int* out, int max_actions, int max_len) {
    Mask m = g_players[p].getMask(2);
    int n = (int)m.action.size();
    if (n > max_actions) n = max_actions;
    for (int a = 0; a < n; ++a) {
        int L = (int)m.action[a].size();
        if (L > max_len - 1) L = max_len - 1;
        for (int k = 0; k < L; ++k) out[a * max_len + k] = m.action[a][k];
        out[a * max_len + L] = -1;
    }
    return n;
}

// Finesse-intent dump: replays TestField's enumeration (getMask,
// TestField.cpp:64-111) and tryAllFinesseMoves' drive loop
// (TestField.cpp:174-187) but records the REST POSE (rot, posX, posY) at
// every point where useFinesseMove would emit an entry — the
// path-independent "intent set" the JAX finesse kernel must reproduce.
// Also appends the top-drop rests (tagged kind=0 vs finesse kind=1).
// out rows: [kind, rot, posX, posY] x4 ints.  Returns row count.
int oracle_get_finesse_rests(int p, int* out, int max_rests) {
    GamePlay& g = g_players[p];
    TestField tf;
    tf.square = g.field.square;
    tf.setPiece(g.field.piece);
    int n = 0;
    auto emit = [&](int kind) {
        if (n < max_rests) {
            out[n * 4 + 0] = kind;
            out[n * 4 + 1] = tf.piece.current_rotation;
            out[n * 4 + 2] = tf.piece.posX;
            out[n * 4 + 3] = tf.piece.posY;
        }
        ++n;
    };
    auto drive = [&]() {                  // findNextMove minus the emission
        tf.hd();
        emit(0);                          // top-drop rest
        auto backup = tf.piece;           // tryAllFinesseMoves
        for (int y = tf.piece.posY + 2; y < FIELD_HEIGHT - 1; ++y) {
            tf.piece = backup;
            tf.piece.posY = y;
            if (tf.possible()) {
                tf.hd();
                y = tf.piece.posY;
                if (tf.finesseIsPossible())
                    emit(1);
            }
        }
        tf.piece = backup;
    };
    if (tf.piece.piece == 6) {
        for (int x = -1; x < FIELD_WIDTH - 1; ++x) {
            tf.piece.posX = x;
            tf.piece.posY = 0;
            if (!tf.possible()) continue;
            drive();
        }
    } else {
        int n_rot = (tf.piece.piece == 4 || tf.piece.piece == 2 ||
                     tf.piece.piece == 3) ? 2 : 4;
        for (int x = -1; x < FIELD_WIDTH - 1; ++x) {
            for (int r = 0; r < n_rot; ++r) {
                tf.piece.posX = x;
                tf.piece.posY = 0;
                while (tf.piece.current_rotation != r)
                    tf.piece.rcw();
                if (!tf.possible()) continue;
                drive();
            }
        }
    }
    return n;
}

// Reference RNG probe: the exact float stream randomizer.h's
// UniformRealDistribution<float> produces from mt19937(short(seed)) — used
// to validate the host-side Python replica that feeds injected streams.
void oracle_uniform_stream(int seed, int n, float* out) {
    std::mt19937 gen((short)seed);
    UniformRealDistribution<float> dist;
    for (int i = 0; i < n; ++i) out[i] = dist(gen);
}

}  // extern "C"
