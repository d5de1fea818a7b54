// facekit native demo client.
//
// Role parity with the reference's client process (src/main.cpp:11-56 +
// src/webclient.{h,cpp}): read an encoded image from disk, POST the raw
// bytes to /recognize (or stream them over the WS /inference socket) and
// print the server's JSON reply. The reference pulls in boost::beast/asio
// for this; a demo client needs neither — plain POSIX sockets, an HTTP/1.1
// POST, and a minimal RFC6455 client (masked frames) cover the contract.
//
// Build:  g++ -std=c++17 -O2 -o facekit_client client.cpp
// Usage:  facekit_client <host> <port> <image.jpg> [--ws] [--repeat N]

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <random>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

class Socket {
 public:
  Socket(const std::string& host, const std::string& port) {
    addrinfo hints{};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    addrinfo* res = nullptr;
    if (getaddrinfo(host.c_str(), port.c_str(), &hints, &res) != 0)
      throw std::runtime_error("resolve failed: " + host);
    fd_ = -1;
    for (addrinfo* p = res; p; p = p->ai_next) {
      fd_ = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
      if (fd_ < 0) continue;
      if (connect(fd_, p->ai_addr, p->ai_addrlen) == 0) break;
      close(fd_);
      fd_ = -1;
    }
    freeaddrinfo(res);
    if (fd_ < 0) throw std::runtime_error("connect failed");
  }
  ~Socket() {
    if (fd_ >= 0) close(fd_);
  }
  void send_all(const void* data, size_t n) const {
    const char* p = static_cast<const char*>(data);
    while (n) {
      ssize_t w = ::send(fd_, p, n, 0);
      if (w <= 0) throw std::runtime_error("send failed");
      p += w;
      n -= static_cast<size_t>(w);
    }
  }
  // read exactly n bytes
  void recv_all(void* data, size_t n) const {
    char* p = static_cast<char*>(data);
    while (n) {
      ssize_t r = ::recv(fd_, p, n, 0);
      if (r <= 0) throw std::runtime_error("recv failed / closed");
      p += r;
      n -= static_cast<size_t>(r);
    }
  }
  // read until EOF
  std::string recv_to_eof() const {
    std::string out;
    char buf[4096];
    for (;;) {
      ssize_t r = ::recv(fd_, buf, sizeof buf, 0);
      if (r < 0) throw std::runtime_error("recv failed");
      if (r == 0) break;
      out.append(buf, static_cast<size_t>(r));
    }
    return out;
  }
  // read one CRLF-terminated header block
  std::string recv_headers() const {
    std::string out;
    char c;
    while (out.size() < (1 << 16)) {
      recv_all(&c, 1);
      out.push_back(c);
      if (out.size() >= 4 && out.compare(out.size() - 4, 4, "\r\n\r\n") == 0)
        return out;
    }
    throw std::runtime_error("oversized response headers");
  }

 private:
  int fd_;
};

std::vector<uint8_t> read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot read " + path);
  return std::vector<uint8_t>(std::istreambuf_iterator<char>(f),
                              std::istreambuf_iterator<char>());
}

// --- HTTP POST /recognize (reference src/webclient.cpp:49-79) -------------

std::string http_post(const std::string& host, const std::string& port,
                      const std::string& target,
                      const std::vector<uint8_t>& body) {
  Socket s(host, port);
  std::ostringstream req;
  req << "POST " << target << " HTTP/1.1\r\n"
      << "Host: " << host << ":" << port << "\r\n"
      << "Content-Type: application/octet-stream\r\n"
      << "Content-Length: " << body.size() << "\r\n"
      << "Connection: close\r\n\r\n";
  const std::string head = req.str();
  s.send_all(head.data(), head.size());
  s.send_all(body.data(), body.size());
  std::string resp = s.recv_to_eof();
  size_t split = resp.find("\r\n\r\n");
  if (split == std::string::npos) throw std::runtime_error("bad response");
  const std::string status = resp.substr(0, resp.find("\r\n"));
  if (status.find(" 200") == std::string::npos)
    throw std::runtime_error("HTTP error: " + status);
  return resp.substr(split + 4);
}

// --- minimal RFC6455 client (reference src/webclient.cpp:3-35) -----------

std::string b64(const uint8_t* data, size_t n) {
  static const char* k =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  for (size_t i = 0; i < n; i += 3) {
    uint32_t v = data[i] << 16;
    if (i + 1 < n) v |= data[i + 1] << 8;
    if (i + 2 < n) v |= data[i + 2];
    out.push_back(k[(v >> 18) & 63]);
    out.push_back(k[(v >> 12) & 63]);
    out.push_back(i + 1 < n ? k[(v >> 6) & 63] : '=');
    out.push_back(i + 2 < n ? k[v & 63] : '=');
  }
  return out;
}

class WsClient {
 public:
  WsClient(const std::string& host, const std::string& port,
           const std::string& target)
      : sock_(host, port), rng_(std::random_device{}()) {
    uint8_t key[16];
    for (auto& b : key) b = static_cast<uint8_t>(rng_());
    std::ostringstream req;
    req << "GET " << target << " HTTP/1.1\r\n"
        << "Host: " << host << ":" << port << "\r\n"
        << "Upgrade: websocket\r\nConnection: Upgrade\r\n"
        << "Sec-WebSocket-Key: " << b64(key, 16) << "\r\n"
        << "Sec-WebSocket-Version: 13\r\n\r\n";
    const std::string head = req.str();
    sock_.send_all(head.data(), head.size());
    std::string resp = sock_.recv_headers();
    if (resp.find(" 101 ") == std::string::npos)
      throw std::runtime_error("websocket upgrade refused: " + resp);
  }

  void send_binary(const std::vector<uint8_t>& payload) {
    std::vector<uint8_t> frame;
    frame.push_back(0x82);  // FIN | binary
    uint8_t mask[4];
    for (auto& b : mask) b = static_cast<uint8_t>(rng_());
    size_t n = payload.size();
    if (n < 126) {
      frame.push_back(static_cast<uint8_t>(0x80 | n));
    } else if (n < (1u << 16)) {
      frame.push_back(0x80 | 126);
      frame.push_back(static_cast<uint8_t>(n >> 8));
      frame.push_back(static_cast<uint8_t>(n));
    } else {
      frame.push_back(0x80 | 127);
      for (int i = 7; i >= 0; --i)
        frame.push_back(static_cast<uint8_t>(
            (static_cast<uint64_t>(n) >> (8 * i)) & 0xff));
    }
    frame.insert(frame.end(), mask, mask + 4);
    size_t off = frame.size();
    frame.resize(off + n);
    for (size_t i = 0; i < n; ++i)
      frame[off + i] = payload[i] ^ mask[i & 3];
    sock_.send_all(frame.data(), frame.size());
  }

  // returns the payload of the next data frame (text or binary)
  std::string recv_message() {
    for (;;) {
      uint8_t hdr[2];
      sock_.recv_all(hdr, 2);
      uint8_t opcode = hdr[0] & 0x0f;
      uint64_t len = hdr[1] & 0x7f;
      bool masked = hdr[1] & 0x80;
      if (len == 126) {
        uint8_t ext[2];
        sock_.recv_all(ext, 2);
        len = (static_cast<uint64_t>(ext[0]) << 8) | ext[1];
      } else if (len == 127) {
        uint8_t ext[8];
        sock_.recv_all(ext, 8);
        len = 0;
        for (int i = 0; i < 8; ++i) len = (len << 8) | ext[i];
      }
      uint8_t mask[4] = {0, 0, 0, 0};
      if (masked) sock_.recv_all(mask, 4);
      std::string payload(len, '\0');
      if (len) sock_.recv_all(&payload[0], len);  // C++14-safe mutable data
      if (masked)
        for (size_t i = 0; i < payload.size(); ++i) payload[i] ^= mask[i & 3];
      if (opcode == 0x9) {  // ping -> pong
        std::vector<uint8_t> p(payload.begin(), payload.end());
        std::vector<uint8_t> frame{0x8a,
                                   static_cast<uint8_t>(0x80 | p.size())};
        uint8_t m[4] = {0, 0, 0, 0};
        frame.insert(frame.end(), m, m + 4);
        frame.insert(frame.end(), p.begin(), p.end());
        sock_.send_all(frame.data(), frame.size());
        continue;
      }
      if (opcode == 0x8) throw std::runtime_error("server closed socket");
      // unsolicited pong (RFC 6455 5.5.3) or stray continuation: not the
      // reply — returning it would desynchronize every later recv
      if (opcode == 0xA || opcode == 0x0) continue;
      return payload;
    }
  }

  void close_ws() {
    uint8_t frame[6] = {0x88, 0x80, 0, 0, 0, 0};  // masked empty close
    sock_.send_all(frame, sizeof frame);
  }

 private:
  Socket sock_;
  std::mt19937 rng_;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::cerr << "usage: " << argv[0]
              << " <host> <port> <image> [--ws] [--repeat N]\n";
    return 2;
  }
  const std::string host = argv[1], port = argv[2], path = argv[3];
  bool ws = false;
  int repeat = 1;
  for (int i = 4; i < argc; ++i) {
    if (std::string(argv[i]) == "--ws") ws = true;
    if (std::string(argv[i]) == "--repeat" && i + 1 < argc)
      repeat = std::stoi(argv[++i]);
  }
  try {
    const std::vector<uint8_t> img = read_file(path);
    if (ws) {
      WsClient c(host, port, "/inference");
      for (int i = 0; i < repeat; ++i) {
        c.send_binary(img);
        std::cout << c.recv_message() << std::endl;
      }
      c.close_ws();
    } else {
      for (int i = 0; i < repeat; ++i)
        std::cout << http_post(host, port, "/recognize", img) << std::endl;
    }
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << std::endl;
    return 1;
  }
  return 0;
}
