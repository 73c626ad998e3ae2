// tetrikv — the framework's native control-plane store.
//
// The reference's entire distributed backend is a Redis server: typed
// wrappers for entries, monotonic clocks, TTL'd alive-flags with atomic
// claiming, byte blobs, work queues, and a recursive stats dictionary
// (drl_tetris/training_state/redis_types.py:25-181, training_state.py:12-52).
// On TPU pods the DATA plane moves into the XLA program (ICI collectives,
// drl_tetris_tpu/parallel), but a host-side CONTROL plane is still needed
// across DCN: run metadata, weight publication for external actors,
// heartbeats, elastic worker-slot allocation, eval brokering.  This is that
// store: a single-binary, zero-dependency C++17 epoll server implementing
// exactly the primitive set the reference used from Redis.
//
// Protocol (length-prefixed, binary-safe values):
//   request  := u32 len | line '\n' | value-bytes
//   line     := CMD [arg [arg]]        (args are key names / integers)
//   response := u32 len | status-byte ('+' ok, '-' err, '$' value) | payload
//
// Commands (redis_types.py analog in parentheses):
//   PING                        liveness
//   SET k        <value>        (entry.set / byte_block.set)
//   GET k                       (entry.get)           -> $value or -missing
//   DEL k
//   INCR k delta                (clock.tick)          -> $new-value
//   EXPIRE k ttl_ms             (flag TTL)
//   CLAIM k ttl_ms              (flag.claim: INCR==1 test-and-set w/ TTL)
//                               -> $1 acquired / $0 not
//   PUSH q       <value>        (queue.push, RPUSH + in-counter)
//   POP q                       (queue.pop, LPOP + out-counter) -> $v / -empty
//   QLEN q                      -> $len
//   FINCR k delta               (dictionary INCRBYFLOAT)  -> $new-value
//   KEYS prefix                 -> $k1\nk2\n...
//   SAVE path / LOAD path       (RDB-style persistence, trainer exit flush)
//
// Build: native/kvstore/build.sh -> tetrikv <port>

#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <signal.h>
#include <sys/epoll.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

int64_t now_ms() {
    using namespace std::chrono;
    return duration_cast<milliseconds>(steady_clock::now().time_since_epoch())
        .count();
}

struct Entry {
    std::string value;
    int64_t expire_at = 0;  // 0 == never
};

struct Store {
    std::unordered_map<std::string, Entry> kv;
    std::unordered_map<std::string, std::deque<std::string>> queues;
    std::unordered_map<std::string, int64_t> q_in, q_out;

    bool expired(const Entry& e) const {
        return e.expire_at != 0 && now_ms() > e.expire_at;
    }

    Entry* get(const std::string& k) {
        auto it = kv.find(k);
        if (it == kv.end()) return nullptr;
        if (expired(it->second)) {
            kv.erase(it);
            return nullptr;
        }
        return &it->second;
    }

    void sweep() {
        for (auto it = kv.begin(); it != kv.end();) {
            if (expired(it->second))
                it = kv.erase(it);
            else
                ++it;
        }
    }

    // RDB-style persistence (docker-compose mounts a db volume for Redis;
    // trainer.py:50 triggers cache.save() on graceful exit).
    bool save(const std::string& path) const {
        std::ofstream f(path, std::ios::binary | std::ios::trunc);
        if (!f) return false;
        auto put_str = [&](const std::string& s) {
            uint64_t n = s.size();
            f.write((char*)&n, 8);
            f.write(s.data(), n);
        };
        uint64_t nk = kv.size();
        f.write((char*)&nk, 8);
        for (auto& [k, e] : kv) {
            put_str(k);
            put_str(e.value);
            f.write((char*)&e.expire_at, 8);
        }
        uint64_t nq = queues.size();
        f.write((char*)&nq, 8);
        for (auto& [k, q] : queues) {
            put_str(k);
            uint64_t n = q.size();
            f.write((char*)&n, 8);
            for (auto& v : q) put_str(v);
        }
        return (bool)f;
    }

    bool load(const std::string& path) {
        std::ifstream f(path, std::ios::binary);
        if (!f) return false;
        auto get_str = [&](std::string& s) {
            uint64_t n = 0;
            f.read((char*)&n, 8);
            s.resize(n);
            f.read(&s[0], n);
        };
        uint64_t nk = 0;
        f.read((char*)&nk, 8);
        for (uint64_t i = 0; i < nk && f; ++i) {
            std::string k, v;
            int64_t exp;
            get_str(k);
            get_str(v);
            f.read((char*)&exp, 8);
            kv[k] = Entry{v, exp};
        }
        uint64_t nq = 0;
        f.read((char*)&nq, 8);
        for (uint64_t i = 0; i < nq && f; ++i) {
            std::string k;
            get_str(k);
            uint64_t n = 0;
            f.read((char*)&n, 8);
            auto& q = queues[k];
            for (uint64_t j = 0; j < n && f; ++j) {
                std::string v;
                get_str(v);
                q.push_back(v);
            }
        }
        return true;
    }
};

Store g_store;

std::string handle(const std::string& line, const std::string& value) {
    std::istringstream ls(line);
    std::string cmd, k, a2;
    ls >> cmd >> k >> a2;

    auto ok = []() { return std::string("+"); };
    auto err = [](const char* m) { return std::string("-") + m; };
    auto val = [](const std::string& v) { return "$" + v; };

    if (cmd == "PING") return val("PONG");
    if (cmd == "SET") {
        auto& e = g_store.kv[k];
        e.value = value;
        e.expire_at = 0;
        return ok();
    }
    if (cmd == "GET") {
        Entry* e = g_store.get(k);
        return e ? val(e->value) : err("missing");
    }
    if (cmd == "DEL") {
        g_store.kv.erase(k);
        return ok();
    }
    if (cmd == "INCR") {
        int64_t d = a2.empty() ? 1 : std::stoll(a2);
        Entry* e = g_store.get(k);
        int64_t cur = 0;
        if (e && !e->value.empty()) cur = std::stoll(e->value);
        cur += d;
        auto& ne = g_store.kv[k];
        ne.value = std::to_string(cur);
        return val(ne.value);
    }
    if (cmd == "FINCR") {
        double d = a2.empty() ? 1.0 : std::stod(a2);
        Entry* e = g_store.get(k);
        double cur = 0;
        if (e && !e->value.empty()) cur = std::stod(e->value);
        cur += d;
        auto& ne = g_store.kv[k];
        ne.value = std::to_string(cur);
        return val(ne.value);
    }
    if (cmd == "EXPIRE") {
        Entry* e = g_store.get(k);
        if (!e) return err("missing");
        e->expire_at = now_ms() + std::stoll(a2);
        return ok();
    }
    if (cmd == "CLAIM") {
        // flag.claim (redis_types.py:118-131): atomic INCR; the claimant
        // that sees 1 owns the slot until the TTL lapses.
        Entry* e = g_store.get(k);
        int64_t cur = (e && !e->value.empty()) ? std::stoll(e->value) : 0;
        cur += 1;
        auto& ne = g_store.kv[k];
        ne.value = std::to_string(cur);
        ne.expire_at = now_ms() + std::stoll(a2);
        return val(cur == 1 ? "1" : "0");
    }
    if (cmd == "PUSH") {
        g_store.queues[k].push_back(value);
        g_store.q_in[k] += 1;
        return ok();
    }
    if (cmd == "POP") {
        auto it = g_store.queues.find(k);
        if (it == g_store.queues.end() || it->second.empty())
            return err("empty");
        std::string v = std::move(it->second.front());
        it->second.pop_front();
        g_store.q_out[k] += 1;
        return val(v);
    }
    if (cmd == "QLEN") {
        auto it = g_store.queues.find(k);
        size_t n = it == g_store.queues.end() ? 0 : it->second.size();
        return val(std::to_string(n));
    }
    if (cmd == "KEYS") {
        std::string out;
        for (auto& [key, e] : g_store.kv) {
            if (!g_store.expired(e) && key.rfind(k, 0) == 0) {
                out += key;
                out += '\n';
            }
        }
        return val(out);
    }
    if (cmd == "SAVE") return g_store.save(k) ? ok() : err("save-failed");
    if (cmd == "LOAD") return g_store.load(k) ? ok() : err("load-failed");
    return err("unknown-command");
}

struct Conn {
    std::string buf;
};

}  // namespace

int main(int argc, char** argv) {
    int port = argc > 1 ? atoi(argv[1]) : 6399;
    signal(SIGPIPE, SIG_IGN);

    int lfd = socket(AF_INET, SOCK_STREAM, 0);
    int one = 1;
    setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    addr.sin_port = htons(port);
    if (bind(lfd, (sockaddr*)&addr, sizeof addr) != 0) {
        perror("bind");
        return 1;
    }
    listen(lfd, 64);

    int ep = epoll_create1(0);
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.fd = lfd;
    epoll_ctl(ep, EPOLL_CTL_ADD, lfd, &ev);

    std::unordered_map<int, Conn> conns;
    std::vector<epoll_event> events(64);
    int64_t last_sweep = now_ms();
    fprintf(stderr, "tetrikv listening on 127.0.0.1:%d\n", port);

    while (true) {
        int n = epoll_wait(ep, events.data(), (int)events.size(), 1000);
        if (now_ms() - last_sweep > 5000) {
            g_store.sweep();
            last_sweep = now_ms();
        }
        for (int i = 0; i < n; ++i) {
            int fd = events[i].data.fd;
            if (fd == lfd) {
                int cfd = accept(lfd, nullptr, nullptr);
                if (cfd < 0) continue;
                setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
                epoll_event cev{};
                cev.events = EPOLLIN;
                cev.data.fd = cfd;
                epoll_ctl(ep, EPOLL_CTL_ADD, cfd, &cev);
                conns[cfd] = Conn{};
                continue;
            }
            auto& c = conns[fd];
            char tmp[65536];
            ssize_t r = read(fd, tmp, sizeof tmp);
            if (r <= 0) {
                close(fd);
                conns.erase(fd);
                continue;
            }
            c.buf.append(tmp, r);
            // drain complete requests
            while (c.buf.size() >= 4) {
                uint32_t len;
                memcpy(&len, c.buf.data(), 4);
                if (c.buf.size() < 4 + (size_t)len) break;
                std::string req = c.buf.substr(4, len);
                c.buf.erase(0, 4 + len);
                size_t nl = req.find('\n');
                std::string line = nl == std::string::npos ? req : req.substr(0, nl);
                std::string value = nl == std::string::npos ? "" : req.substr(nl + 1);
                std::string resp = handle(line, value);
                uint32_t rlen = (uint32_t)resp.size();
                std::string out;
                out.resize(4);
                memcpy(&out[0], &rlen, 4);
                out += resp;
                size_t off = 0;
                while (off < out.size()) {
                    ssize_t w = write(fd, out.data() + off, out.size() - off);
                    if (w <= 0) break;
                    off += (size_t)w;
                }
            }
        }
    }
}
