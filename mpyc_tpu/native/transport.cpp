// Native full-mesh TCP share exchange with pc-tagged frames.
//
// C++ counterpart of mpyc_tpu/parallel/exchange.py (and the role uvloop
// plays for the reference, mpyc/__init__.py:168-194): one epoll event loop
// thread per party process, persistent duplex connections per party pair
// (party i accepts from j < i, dials j > i), frames = <pc:int64 LE,
// len:uint32 LE, payload>, out-of-order arrival buffered by (peer, pc),
// PRSS keys exchanged in-band at connect. Wire-compatible with the Python
// asyncio backend so mixed deployments interoperate.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/epoll.h>
#include <sys/socket.h>
#include <unistd.h>
#include <fcntl.h>
#include <atomic>
#include <cerrno>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
    int64_t pc;
    std::vector<uint8_t> data;
};

struct Peer {
    int fd = -1;
    int pid = -1;
    bool handshaken = false;
    std::vector<uint8_t> inbuf;
    std::deque<std::vector<uint8_t>> outq;  // pending writes
    size_t out_off = 0;
};

struct Mesh {
    int pid;
    int m;
    std::vector<std::string> hosts;
    std::vector<int> ports;
    std::vector<uint8_t> my_keys;     // concatenated 16-byte keys per peer:
                                      // layout [peer][key_index]
    std::vector<int> my_key_counts;   // keys destined for each peer
    std::vector<std::vector<uint8_t>> peer_keys;  // received from each peer
    int expected_keys_from;           // per-peer expected key count (uniform)

    int epfd = -1;
    int listen_fd = -1;
    int wake_fds[2] = {-1, -1};
    std::thread loop_thread;
    bool stopping = false;
    std::atomic<bool> loop_exit{false};
    bool single = false;   // post-connect: protocol thread pumps inline

    std::mutex mu;
    std::condition_variable cv;
    std::map<int, Peer> peers_by_fd;
    std::map<int, int> fd_by_pid;
    std::map<std::pair<int, int64_t>, std::vector<uint8_t>> msgs;
    std::deque<std::pair<int, std::vector<uint8_t>>> sendq;  // (pid, frame)
    int connected = 0;
    uint64_t nbytes_sent = 0;
    std::string error;
};

void set_nonblock(int fd) {
    int fl = fcntl(fd, F_GETFL, 0);
    fcntl(fd, F_SETFL, fl | O_NONBLOCK);
}

void set_nodelay(int fd) {
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
}

// NB: callers of send_all_queued / enqueue_write must hold mx->mu —
// peer out-queues are written both by the epoll loop thread and (direct
// send fast path) by the protocol thread in mx_send.
bool send_all_queued(Mesh* mx, Peer& p) {
    while (!p.outq.empty()) {
        auto& buf = p.outq.front();
        while (p.out_off < buf.size()) {
            ssize_t k = ::send(p.fd, buf.data() + p.out_off,
                               buf.size() - p.out_off, MSG_NOSIGNAL);
            if (k > 0) {
                p.out_off += static_cast<size_t>(k);
            } else if (k < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
                return true;  // try again on EPOLLOUT
            } else {
                return false;
            }
        }
        p.outq.pop_front();
        p.out_off = 0;
    }
    return true;
}

std::vector<uint8_t> make_handshake(Mesh* mx, int peer_pid) {
    // '<iI' pid, nkeys, then 16-byte keys for this peer
    int nkeys = mx->my_key_counts[peer_pid];
    std::vector<uint8_t> out(8 + 16 * nkeys);
    int32_t pid32 = mx->pid;
    uint32_t nk32 = static_cast<uint32_t>(nkeys);
    memcpy(out.data(), &pid32, 4);
    memcpy(out.data() + 4, &nk32, 4);
    // keys for peer are packed sequentially in my_keys at offset
    size_t off = 0;
    for (int q = 0; q < peer_pid; q++) off += 16 * mx->my_key_counts[q];
    memcpy(out.data() + 8, mx->my_keys.data() + off, 16 * nkeys);
    return out;
}

void enqueue_write(Mesh* mx, Peer& p, std::vector<uint8_t> data) {
    p.outq.push_back(std::move(data));
    send_all_queued(mx, p);
    if (!p.outq.empty()) {
        epoll_event ev{};
        ev.events = EPOLLIN | EPOLLOUT;
        ev.data.fd = p.fd;
        epoll_ctl(mx->epfd, EPOLL_CTL_MOD, p.fd, &ev);
    }
}

void process_inbuf(Mesh* mx, Peer& p) {
    auto& b = p.inbuf;
    size_t off = 0;
    if (!p.handshaken) {
        if (b.size() < 8) return;
        int32_t pid32;
        uint32_t nk;
        memcpy(&pid32, b.data(), 4);
        memcpy(&nk, b.data() + 4, 4);
        size_t need = 8 + 16 * static_cast<size_t>(nk);
        if (b.size() < need) return;
        {
            std::lock_guard<std::mutex> lk(mx->mu);
            p.pid = pid32;
            mx->fd_by_pid[p.pid] = p.fd;
            mx->peer_keys[p.pid].assign(b.begin() + 8, b.begin() + need);
            mx->connected++;
            off = need;
            p.handshaken = true;
            if (p.pid < mx->pid) {
                // mesh rule: we accept from lower pids; reply with our
                // handshake (dialed peers got ours at connect)
                enqueue_write(mx, p, make_handshake(mx, p.pid));
            }
        }
        mx->cv.notify_all();
    }
    while (b.size() - off >= 12) {
        int64_t pc;
        uint32_t len;
        memcpy(&pc, b.data() + off, 8);
        memcpy(&len, b.data() + off + 8, 4);
        if (b.size() - off - 12 < len) break;
        {
            std::lock_guard<std::mutex> lk(mx->mu);
            mx->msgs[{p.pid, pc}] = std::vector<uint8_t>(
                b.begin() + off + 12, b.begin() + off + 12 + len);
        }
        mx->cv.notify_all();
        off += 12 + len;
    }
    if (off) b.erase(b.begin(), b.begin() + off);
}

void process_events(Mesh* mx, int timeout_ms) {
    epoll_event evs[64];
    {
        int n = epoll_wait(mx->epfd, evs, 64, timeout_ms);
        for (int i = 0; i < n; i++) {
            int fd = evs[i].data.fd;
            if (fd == mx->wake_fds[0]) {
                uint8_t tmp[256];
                while (read(fd, tmp, sizeof(tmp)) > 0) {}
                // drain send queue
                std::deque<std::pair<int, std::vector<uint8_t>>> q;
                {
                    std::lock_guard<std::mutex> lk(mx->mu);
                    q.swap(mx->sendq);
                }
                for (auto& item : q) {
                    std::lock_guard<std::mutex> lk(mx->mu);
                    auto it = mx->fd_by_pid.find(item.first);
                    if (it == mx->fd_by_pid.end()) continue;
                    auto pit = mx->peers_by_fd.find(it->second);
                    if (pit != mx->peers_by_fd.end())
                        enqueue_write(mx, pit->second, std::move(item.second));
                }
                continue;
            }
            if (fd == mx->listen_fd) {
                while (true) {
                    int cfd = accept(mx->listen_fd, nullptr, nullptr);
                    if (cfd < 0) break;
                    set_nonblock(cfd);
                    set_nodelay(cfd);
                    {
                        std::lock_guard<std::mutex> lk(mx->mu);
                        Peer p;
                        p.fd = cfd;
                        mx->peers_by_fd[cfd] = std::move(p);
                    }
                    epoll_event ev{};
                    ev.events = EPOLLIN;
                    ev.data.fd = cfd;
                    epoll_ctl(mx->epfd, EPOLL_CTL_ADD, cfd, &ev);
                }
                continue;
            }
            auto it = mx->peers_by_fd.find(fd);
            if (it == mx->peers_by_fd.end()) continue;
            Peer& p = it->second;
            if (evs[i].events & EPOLLOUT) {
                std::lock_guard<std::mutex> lk(mx->mu);
                send_all_queued(mx, p);
                if (p.outq.empty()) {
                    epoll_event ev{};
                    ev.events = EPOLLIN;
                    ev.data.fd = fd;
                    epoll_ctl(mx->epfd, EPOLL_CTL_MOD, fd, &ev);
                }
            }
            if (evs[i].events & EPOLLIN) {
                uint8_t buf[65536];
                while (true) {
                    ssize_t k = recv(fd, buf, sizeof(buf), 0);
                    if (k > 0) {
                        p.inbuf.insert(p.inbuf.end(), buf, buf + k);
                    } else if (k < 0 && (errno == EAGAIN ||
                                         errno == EWOULDBLOCK)) {
                        break;
                    } else {
                        // closed
                        break;
                    }
                }
                process_inbuf(mx, p);
            }
        }
    }
}

void loop_main(Mesh* mx) {
    // Background pump: runs only during connection setup.  Once the mesh
    // is up, mx_wait_connected joins this thread and every send/receive
    // pumps epoll inline on the protocol thread (asyncio-style single
    // threading: no cross-thread wakeups, which cost 50-150 us per
    // protocol round on a host running m party processes).
    while (!mx->stopping && !mx->loop_exit)
        process_events(mx, 100);
}

}  // namespace

extern "C" {

// key_counts: int per peer; keys: concatenated 16B keys ordered by peer
void* mx_create(int pid, int m, const char** hosts, const int* ports,
                const int* key_counts, const uint8_t* keys) {
    auto* mx = new Mesh();
    mx->pid = pid;
    mx->m = m;
    size_t total = 0;
    mx->my_key_counts.assign(key_counts, key_counts + m);
    for (int i = 0; i < m; i++) total += 16 * key_counts[i];
    mx->my_keys.assign(keys, keys + total);
    mx->peer_keys.resize(m);
    for (int i = 0; i < m; i++) {
        mx->hosts.push_back(hosts[i]);
        mx->ports.push_back(ports[i]);
    }
    mx->epfd = epoll_create1(0);
    if (pipe2(mx->wake_fds, O_NONBLOCK) != 0) {
        mx->error = "pipe2 failed";
        return mx;
    }
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.fd = mx->wake_fds[0];
    epoll_ctl(mx->epfd, EPOLL_CTL_ADD, mx->wake_fds[0], &ev);

    if (pid > 0) {  // accept from lower pids
        mx->listen_fd = socket(AF_INET, SOCK_STREAM, 0);
        int one = 1;
        setsockopt(mx->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one,
                   sizeof(one));
        sockaddr_in addr{};
        addr.sin_family = AF_INET;
        addr.sin_addr.s_addr = INADDR_ANY;
        addr.sin_port = htons(static_cast<uint16_t>(ports[pid]));
        if (bind(mx->listen_fd, reinterpret_cast<sockaddr*>(&addr),
                 sizeof(addr)) != 0) {
            mx->error = "bind failed";
            return mx;
        }
        listen(mx->listen_fd, m);
        set_nonblock(mx->listen_fd);
        epoll_event lev{};
        lev.events = EPOLLIN;
        lev.data.fd = mx->listen_fd;
        epoll_ctl(mx->epfd, EPOLL_CTL_ADD, mx->listen_fd, &lev);
    }

    mx->loop_thread = std::thread(loop_main, mx);

    // dial higher pids (blocking connects with retry, then hand to epoll)
    for (int peer = pid + 1; peer < m; peer++) {
        int fd = -1;
        for (int attempt = 0; attempt < 600; attempt++) {
            fd = socket(AF_INET, SOCK_STREAM, 0);
            sockaddr_in addr{};
            addr.sin_family = AF_INET;
            addr.sin_port = htons(static_cast<uint16_t>(mx->ports[peer]));
            hostent* he = gethostbyname(mx->hosts[peer].c_str());
            if (he != nullptr) {
                memcpy(&addr.sin_addr, he->h_addr, he->h_length);
                if (connect(fd, reinterpret_cast<sockaddr*>(&addr),
                            sizeof(addr)) == 0)
                    break;
            }
            close(fd);
            fd = -1;
            usleep(100000);
        }
        if (fd < 0) {
            mx->error = "connect failed to peer " + std::to_string(peer);
            return mx;
        }
        set_nodelay(fd);
        // send our handshake synchronously before going nonblocking
        auto hs = make_handshake(mx, peer);
        size_t off = 0;
        while (off < hs.size()) {
            ssize_t k = ::send(fd, hs.data() + off, hs.size() - off,
                               MSG_NOSIGNAL);
            if (k <= 0) break;
            off += static_cast<size_t>(k);
        }
        set_nonblock(fd);
        {
            std::lock_guard<std::mutex> lk(mx->mu);
            Peer p;
            p.fd = fd;
            // peer pid known: mark handshaken pending their reply
            mx->peers_by_fd[fd] = std::move(p);
        }
        epoll_event cev{};
        cev.events = EPOLLIN;
        cev.data.fd = fd;
        epoll_ctl(mx->epfd, EPOLL_CTL_ADD, fd, &cev);
    }
    return mx;
}

int mx_wait_connected(void* h, int timeout_ms) {
    auto* mx = static_cast<Mesh*>(h);
    {
        std::unique_lock<std::mutex> lk(mx->mu);
        bool ok = mx->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                  [&] { return mx->connected >= mx->m - 1; });
        if (!ok) return -1;
    }
    // switch to single-threaded inline pumping (see loop_main)
    mx->loop_exit = true;
    uint8_t one = 1;
    ssize_t r = write(mx->wake_fds[1], &one, 1);
    (void)r;
    if (mx->loop_thread.joinable()) mx->loop_thread.join();
    mx->single = true;
    return 0;
}

int mx_send(void* h, int peer, int64_t pc, const uint8_t* data,
            uint32_t len) {
    auto* mx = static_cast<Mesh*>(h);
    std::vector<uint8_t> frame(12 + len);
    memcpy(frame.data(), &pc, 8);
    memcpy(frame.data() + 8, &len, 4);
    if (len) memcpy(frame.data() + 12, data, len);
    {
        std::unique_lock<std::mutex> lk(mx->mu);
        mx->nbytes_sent += len;
        // direct-send fast path: write on the caller's thread when the
        // peer is connected — saves a wake + thread hop per frame (the
        // hop costs tens of microseconds per protocol round on a busy
        // host).  Falls back to the queue + wake when not yet connected
        // or when a partial write leaves bytes pending (EPOLLOUT armed
        // here; the loop thread drains under the same mutex).
        auto it = mx->fd_by_pid.find(peer);
        if (it != mx->fd_by_pid.end()) {
            auto pit = mx->peers_by_fd.find(it->second);
            if (pit != mx->peers_by_fd.end() && pit->second.handshaken) {
                Peer& p = pit->second;
                int pfd = p.fd;
                p.outq.push_back(std::move(frame));
                send_all_queued(mx, p);
                if (!p.outq.empty()) {
                    epoll_event ev{};
                    ev.events = EPOLLIN | EPOLLOUT;
                    ev.data.fd = pfd;
                    epoll_ctl(mx->epfd, EPOLL_CTL_MOD, pfd, &ev);
                    if (mx->single) {
                        // no background pump: flush inline so peers are
                        // never starved if we exit without receiving
                        while (true) {
                            auto pit2 = mx->peers_by_fd.find(pfd);
                            if (pit2 == mx->peers_by_fd.end() ||
                                pit2->second.outq.empty())
                                break;
                            lk.unlock();
                            process_events(mx, 1);
                            lk.lock();
                        }
                    }
                }
                return 0;
            }
        }
        mx->sendq.emplace_back(peer, std::move(frame));
    }
    uint8_t one = 1;
    ssize_t r = write(mx->wake_fds[1], &one, 1);
    (void)r;
    return 0;
}

// returns length, or -1 on timeout; call with buf=null to query length only
int64_t mx_recv(void* h, int peer, int64_t pc, uint8_t* buf,
                int64_t buf_len, int timeout_ms) {
    auto* mx = static_cast<Mesh*>(h);
    std::unique_lock<std::mutex> lk(mx->mu);
    auto key = std::make_pair(peer, pc);
    bool ok = mx->msgs.count(key) > 0;
    if (!ok && mx->single) {
        // single-threaded mode: pump the event loop inline until the
        // frame lands (asyncio-style; no cross-thread handoff)
        auto deadline = std::chrono::steady_clock::now() +
                        std::chrono::milliseconds(timeout_ms);
        while (!ok) {
            lk.unlock();
            process_events(mx, 1);
            lk.lock();
            ok = mx->msgs.count(key) > 0;
            if (!ok && std::chrono::steady_clock::now() > deadline)
                return -1;
        }
    }
    if (!ok)
        ok = mx->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                             [&] { return mx->msgs.count(key) > 0; });
    if (!ok) return -1;
    auto& v = mx->msgs[key];
    int64_t n = static_cast<int64_t>(v.size());
    if (buf == nullptr) return n;
    if (n > buf_len) return -2;
    if (n) memcpy(buf, v.data(), static_cast<size_t>(n));
    mx->msgs.erase(key);
    return n;
}

int mx_peer_keys(void* h, int peer, uint8_t* buf, int buf_len) {
    auto* mx = static_cast<Mesh*>(h);
    std::lock_guard<std::mutex> lk(mx->mu);
    auto& v = mx->peer_keys[peer];
    int n = static_cast<int>(v.size());
    if (buf == nullptr) return n;
    if (n > buf_len) return -2;
    if (n) memcpy(buf, v.data(), static_cast<size_t>(n));
    return n;
}

uint64_t mx_nbytes_sent(void* h) {
    return static_cast<Mesh*>(h)->nbytes_sent;
}

const char* mx_error(void* h) {
    return static_cast<Mesh*>(h)->error.c_str();
}

void mx_stop(void* h) {
    auto* mx = static_cast<Mesh*>(h);
    mx->stopping = true;
    uint8_t one = 1;
    ssize_t r = write(mx->wake_fds[1], &one, 1);
    (void)r;
    if (mx->loop_thread.joinable()) mx->loop_thread.join();
    for (auto& kv : mx->peers_by_fd) close(kv.second.fd);
    if (mx->listen_fd >= 0) close(mx->listen_fd);
    close(mx->wake_fds[0]);
    close(mx->wake_fds[1]);
    close(mx->epfd);
    delete mx;
}

}  // extern "C"
