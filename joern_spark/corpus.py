"""Deterministic fixture corpus (FIXTURES.md §3) + the scaled synthetic corpus.

Docs follow the input hint exactly:
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``.
Code is split into spans at deterministic line boundaries; F8 interleaves
media spans to exercise the span-sequence invariant. F7-style scaling
(``skew_corpus``) stresses the hot-symbol call-linking join (every doc calls
``printf``/``malloc``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schema import DOCS_SCHEMA

F1_FLOW_C = """int flow(int p0) {
  int a = p0;
  int b=a;
  int c=0x31;
  int z = b + c;
  z++;
  int x = z;
  return x;
}"""

F2_FREE_LIST_C = """void free_list(struct node *head) {
  struct node *q;
  for (struct node *p = head; p != NULL; p = q) {
    q = p->next;
    free(p);
  }
}"""

F3_TEST_C = """int main() { print_number(42); return 0; }
void print_number(int x) { printf(x); return; }"""

F4_ZOO_C = """int zoo(int x) {
  if (x < 10) { x += 1; } else { x -= 1; }
  while (x > 0) { if (x == 5) break; x--; }
  do { x++; } while (x < 3);
  switch (x) { case 1: x = 2; break; default: x = 3; }
  int y = (x > 0 && x < 100) ? x : 0;
  return y;
}

int peek(int *a, int i) {
  a[i] = a[0] + 1;
  return a[i];
}"""

F5_METHODTEST_JAVA = """public class MethodTest {
  public static int staticMethod(int var) { return var; }
  public int nonStaticMethod(int var) { return var; }
  public String callsExternalMethod() { return super.toString(); }
  private String internalMethod() { return ""; }
  public String callsNoExternalMethod() { return internalMethod(); }
}"""

F6_DISPATCH_JAVA = """class A { int f() { return 1; } }
class B extends A { int f() { return 2; } }
class UseIt { int g(A a) { return a.f(); } }"""


F10_FNPTR_C = """void handler(int e) { printf(e); }
void reg() { submit(handler); }"""

F12_MACRO_C = """#define LIMIT 42
#define SQR(x) ((x) * (x))
int mac() {
  int n = LIMIT;
  int m = SQR(n);
  return m;
}"""

F11_HINT_JAVA = """class Impl { int f() { return 1; } }
class UseDyn {
  int g() {
    Object h = new Impl();
    return h.f();
  }
}"""

F13_APP_JS = """const util = require('my_utils');
function greet(name) {
  let msg = 'hi ' + name;
  log(msg);
  return msg;
}
function use(obj) {
  return obj.render(1);
}
class Wid {
  render(x) { return x + 1; }
  tally(x) { return x * 3; }
}
class WidSub extends Wid {
  render(x) { return x + 2; }
}
let h = new Wid();
let r = h.render(41);
let v = h.data;
let w = h['data'];
let a = new Wid();
let b = a;
let z = b.tally(2);
z ??= 7;
greet('bob');
const twice = (n) => n + n;
let t2 = twice(z);
let {data: dd, extra} = h;
let [d1, d2] = v;
let tl = `z=${z + 1}!`;
each(v, (e) => log(e));
"""

F14_PACKAGE_JSON = """{
  "name": "fixture-app",
  "version": "1.0.0",
  "dependencies": { "my_utils": "^2.0.0" }
}"""

F15_APP_PY = """import py_utils
from os import path

def py_greet(name):
    msg = "hi " + name
    emit(msg)
    return msg

class PWid:
    flavor = 1
    def draw(self, x):
        return x + 1
    def total(self, xs):
        t = 0
        for i in xs:
            t = t + i
        return t

class PWidSub(PWid):
    def draw(self, x):
        if x > 0:
            return x + 2
        elif x < 0:
            return 0
        else:
            return x

w = PWid()
r = w.draw(41)
v = w.flavor
z = dyn_obj.total(2)
s = py_greet("bob")

@wraps
def py_scale(x, factor=2):
    return x * factor

qs = [i + 1 for i in [r] if i > 0]
ds = {1: r, 2: v}
try:
    y2 = py_scale(r, factor=3)
except ValueError as exc:
    y2 = 0
finally:
    emit(y2)
with py_ctx() as fh:
    emit(fh)
"""

F16_SCANNERS_C = """/* seeded querydb-scanner positives */
void risky_io(char *dst, char *src) {
  char buf[64];
  gets(buf);
  scanf("%s", buf);
  strcpy(dst, src);
  strcat(dst, src);
  strtok(src, ",");
  getwd(buf);
}
int shifty(int val, char *src) {
  int n = strlen(src);
  val <<= 24;
  int r = 255 << val;
  long m = val << val;
  unsigned int u = 3;
  int ok = u << 2;
  return r;
}
void drop_priv() {
  setuid(0);
}
void drop_priv_ok() {
  if (setgid(0) == 0) { setuid(0); }
}
int copy_idx(char *dst, char *src, int n) {
  for (int i = 0; i < n; i++) {
    dst[i] = src[i];
  }
  return 0;
}
int copy_mix(char *dst, char *src, int n) {
  int t = 0;
  for (int a = 0; a < n; a++) { t = t + a; }
  for (int b = 0; b < n; b++) { dst[a] = src[b]; }
  return t;
}
void reuse_after_free(char *x, char *y) {
  free(x);
  log(x);
  free(y);
  y = 0;
  log(y);
}
void rv_unchecked(int fd) {
  char rbuf[8];
  read(fd, rbuf, 8);
}
int rv_checked(int fd) {
  char rbuf2[8];
  int nb = read(fd, rbuf2, 8);
  if (nb > 0) { nb = 0; }
  return nb;
}
int rv_direct(int fd) {
  char rbuf3[8];
  if (read(fd, rbuf3, 8) > 0) { return 1; }
  return 0;
}
void sock_unchecked(int sfd, char *sbuf) {
  send(sfd, sbuf, 8, 0);
}
void sock_checked(int sfd2, char *sbuf2) {
  if (send(sfd2, sbuf2, 8, 0) <= 0) { sfd2 = 0; }
}
void race_two(char *rpath) {
  chmod(rpath, 0);
  rename(rpath, "/tmp/nx");
}
void race_ok(char *rp2, char *rp3) {
  chmod(rp2, 0);
  rename(rp3, "/tmp/nx2");
}"""

F17_INJECTION_JAVA = """class Db {
  int query(String s) { return len(s); }
}
class Controller {
  @Route(path = "/h")
  ModelAndView handle(String input) {
    String q = input;
    Db db = new Db();
    db.query(q);
    return null;
  }
  @Deprecated
  int safe(int z) { return z; }
}
class Exec {
  @Wired("env")
  Process spawn(Runtime rt, String cmd) { return rt.exec(cmd); }
}"""

F19_CRYPTO_JAVA = """class CryptoUse {
  MessageDigest weak() {
    String algo = "MD5";
    MessageDigest md = MessageDigest.getInstance(algo);
    return md;
  }
  MessageDigest weak2() {
    MessageDigest md = MessageDigest.getInstance("SHA-1");
    return md;
  }
  MessageDigest strong() {
    String algo = "SHA-256";
    MessageDigest md = MessageDigest.getInstance(algo);
    return md;
  }
  PBEKeySpec lowiter(String pw, String salt) {
    PBEKeySpec spec = new PBEKeySpec(pw, salt, 500, 2048);
    return spec;
  }
  PBEKeySpec okiter(String pw, String salt) {
    PBEKeySpec spec = new PBEKeySpec(pw, salt, 4000, 2048);
    return spec;
  }
}"""

F20_METRICS_C = """int mx_params(int a, int b, int c, int d, int e) { return a; }
int mx_params_ok(int a, int b, int c, int d) { return a; }
int mx_complex(int x) {
  while (x > 0) { x = x - 1; }
  if (x > 1) { x = 2; }
  if (x > 2) { x = 3; }
  if (x > 3) { x = 4; }
  if (x > 4) { x = 5; }
  return x;
}
int mx_loops(int x) {
  while (x > 0) { x = x - 1; }
  while (x > 1) { x = x - 1; }
  do { x = x - 1; } while (x > 2);
  for (x = 9; x > 3; x = x - 1) { x = x - 1; }
  for (x = 9; x > 4; x = x - 1) { x = x - 1; }
  return x;
}
int mx_returns(int x) {
  if (x > 10) { return 0; }
  return 1;
}
int mx_nested(int x) {
  if (x > 1) {
    if (x > 2) {
      if (x > 3) {
        if (x > 4) { x = 5; }
      }
    }
  }
  return x;
}"""

F22_HEAP_C = """int vulnerable(int len, char *hsrc) {
  char *dst = malloc(len + 8);
  if (dst) { memcpy(dst, hsrc, len + 7); }
  return 0;
}
int non_vulnerable(int len, char *hsrc) {
  char *dst = malloc(len + 8);
  if (dst) { memcpy(dst, hsrc, len + 8); }
  return 0;
}
int non_vulnerable2(int len, char *hsrc) {
  char *dst = malloc(some_size);
  if (dst) { memcpy(dst, hsrc, some_size); }
  return 0;
}"""

F29_NULLTERM_C = """int nt_bad(int asize, char *ntsrc) {
  char *ptr = malloc(asize);
  if (ptr) { strncpy(ptr, ntsrc, asize); }
  return 0;
}
int nt_good(int asize, char *ntsrc) {
  char *ptr = malloc(asize + 1);
  if (ptr) { strncpy(ptr, ntsrc, asize); }
  return 0;
}
int nt_alsogood(int asize, char *ntsrc) {
  char *ptr = malloc(asize);
  if (ptr) {
    strncpy(ptr, ntsrc, asize);
    ptr[asize - 1] = 0;
  }
  return 0;
}"""

F30_GETENV_C = """void env_copy(char *dst) {
  char *p = getenv("PATH");
  strcpy(dst, p);
}
void env_safe(char *dst2) {
  char *p2 = getenv("HOME");
  strcpy(dst2, "lit");
}"""

F31_PHPISH_JS = """function phpish(db) {
  var q = _REQUEST["cmd"];
  db.query(q);
  shell_exec(q);
}
function phpish_safe(db2) {
  var s2 = "safe";
  db2.query(s2);
  shell_exec(s2);
}"""

F32_ROOT_JAVA = """class RootCheck {
  void onCreate() {
    boolean r = isRooted();
    log(r);
  }
  boolean isRooted() {
    String path = "/system/xbin/su";
    File f = new File(path);
    boolean e = f.exists();
    return e;
  }
  boolean isRootedNop() {
    String p2 = "/system/app/Superuser.apk";
    File g = new File(p2);
    boolean e2 = g.exists();
    return e2;
  }
}"""

F33_MANIFEST_BACKUP = """<?xml version="1.0" encoding="utf-8"?>
<manifest xmlns:android="http://schemas.android.com/apk/res/android"
    package="com.example.backup">
    <application
        android:allowBackup="true"
        android:label="BackupApp">
        <activity android:name=".MainActivity" android:exported="true" />
    </application>
</manifest>"""

F34_MANIFEST_OK = """<?xml version="1.0" encoding="utf-8"?>
<manifest xmlns:android="http://schemas.android.com/apk/res/android"
    package="com.example.nobackup">
    <application
        android:allowBackup="false"
        android:label="NoBackupApp">
        <activity android:name=".MainActivity" android:exported="true" />
    </application>
</manifest>"""

F35_GRADLE_TAP = """plugins {
    id 'com.android.application'
}
android {
    compileSdk 32
    defaultConfig {
        minSdk 17
        targetSdk 21
    }
}"""

F36_PRNG_JAVA = """class Rng {
  SecureRandom prng() {
    SecureRandom r = SecureRandom.getInstance("SHA1PRNG");
    return r;
  }
}"""

F37_MANIFEST_ATTACK = """<?xml version="1.0" encoding="utf-8"?>
<manifest xmlns:android="http://schemas.android.com/apk/res/android"
    package="com.example.attack">
    <uses-permission android:name="android.permission.READ_EXTERNAL_STORAGE" />
    <application
        android:allowBackup="false"
        android:usesCleartextTraffic="true"
        android:label="AttackApp">
        <activity android:name=".FwdActivity" android:exported="true" />
        <activity android:name=".SafeActivity" android:exported="false" />
        <receiver android:name=".EvilReceiver" android:exported="true" />
        <receiver android:name=".TameReceiver" android:exported="false" />
    </application>
</manifest>"""

F38_INTENT_JAVA = """class FwdActivity {
  void onCreate(Runtime rt) {
    Intent ix = getIntent();
    rt.exec(ix);
  }
}
class SafeActivity {
  void onCreate(Runtime rt2) {
    Intent iy = getIntent();
    rt2.exec(iy);
  }
}"""

F39_RECEIVER_JAVA = """class EvilReceiver {
  void onReceive(Context ctx, Intent inx) {
    FileOutputStream fos = openOut(ctx);
    fos.write(inx);
  }
  FileOutputStream openOut(Context c) {
    FileOutputStream o = new FileOutputStream(c);
    return o;
  }
}
class TameReceiver {
  void onReceive(Context ctx2, Intent iny) {
    FileOutputStream fos2 = openOut2(ctx2);
    fos2.write(iny);
  }
  FileOutputStream openOut2(Context c2) {
    FileOutputStream o2 = new FileOutputStream(c2);
    return o2;
  }
}"""

F40_DEX_JAVA = """class Dyn {
  void risky(Method m, Object a) {
    File base = getExternalStorageDirectory();
    DexClassLoader dcl = new DexClassLoader(base, null);
    Class k = dcl.loadClass("evil");
    m.invoke(k, a);
  }
  void tame(Method m2, Object a2, String local) {
    DexClassLoader dcl2 = new DexClassLoader(local, null);
    Class k2 = dcl2.loadClass("ok");
    m2.invoke(k2, a2);
  }
}"""

F41_WEBVIEW_JAVA = """class Bridge {
  @JavascriptInterface
  void run(Runtime rt, String cmd) {
    rt.exec(cmd);
  }
}
class SafeBridge {
  @JavascriptInterface
  void run(Logger lg, String msg) {
    lg.info(msg);
  }
}
class WebHost {
  void setup(WebView wv) {
    wv.setJavaScriptEnabled(true);
    Bridge b = new Bridge();
    wv.addJavascriptInterface(b, "bridge");
    String u = "http://insecure.example";
    wv.loadUrl(u);
  }
}
class SafeHost {
  void setup(WebView wv2) {
    wv2.setJavaScriptEnabled(true);
    SafeBridge b2 = new SafeBridge();
    wv2.addJavascriptInterface(b2, "safe");
    String u2 = "https://secure.example";
    wv2.loadUrl(u2);
  }
}"""

F42_UNZIP_JAVA = """class Unzip {
  void unsafe(ZipEntry entry, String destDir) {
    File fileForEntry = entryFileU(destDir, entry);
    FileOutputStream out = new FileOutputStream(fileForEntry);
    drain(out);
  }
  void safe(ZipEntry entry2, String destDir2) {
    File f2 = entryFileS(destDir2, entry2);
    boolean ok = f2.startsWith(destDir2);
    FileOutputStream out2 = new FileOutputStream(f2);
    drain(out2);
  }
  File entryFileU(String d, ZipEntry e) {
    File r = new File(d, e);
    return r;
  }
  File entryFileS(String d2, ZipEntry e2) {
    File r2 = new File(d2, e2);
    return r2;
  }
}"""

F43_TRUSTMGR_JAVA = """class NopTrust implements X509TrustManager {
  void checkClientTrusted(X509Certificate chain, String authType) {}
  void checkServerTrusted(X509Certificate chain2, String authType2) {}
}
class StrictTrust implements X509TrustManager {
  void checkClientTrusted(X509Certificate c, String a) { validate(c); }
  void checkServerTrusted(X509Certificate c2, String a2) { validate(c2); }
  void validate(X509Certificate v) { log(v); }
}
class CtxUse {
  void insecure(SSLContext ctx, SecureRandom sr) {
    TrustManager tms = new NopTrust();
    ctx.init(null, tms, sr);
  }
  void secure(SSLContext ctx2, SecureRandom sr2) {
    TrustManager tms2 = new StrictTrust();
    ctx2.init(null, tms2, sr2);
  }
}"""

F44_REDIRECT_JAVA = """class Redirector {
  void matching(Intent theIntent) {
    Intent fwd = theIntent.getParcelableExtra("k");
    startActivity(fwd);
  }
  void nonmatching(Intent theIntent2) {
    Intent fwd2 = theIntent2.getParcelableExtra("k");
    boolean ok = approved(fwd2);
    if (ok) { startActivity(fwd2); }
  }
  boolean approved(Intent q) {
    boolean v = q.resolveActivity();
    return v;
  }
}"""

F46_UAF_FIELD_C = """void field_free_bad(struct box *b) {
  free(b->ptr);
  if (cond) {
    return;
  }
  b->ptr = mk();
}
void field_free_ok(struct box *c) {
  free(c->ptr);
  if (cond) {
    c->ptr = 0;
    return;
  }
  c->ptr = mk();
}
void field_free_whole(struct box *w) {
  free(w->ptr);
  free(w);
}
void ret_bad(struct box *r) {
  char *x = mk();
  r->foo = x;
  free(x);
}
void ret_good(struct box *g) {
  char *gx = mk();
  char *gy = mk();
  g->foo = gx;
  free(gy);
}
void ret_reassigned(struct box *h) {
  char *hx = mk();
  h = other();
  h->foo = hx;
  free(hx);
}"""

F47_NET_KT = """import java.net;
class KFetch {
  fun insecure(): Int {
    val u = URL("http://phrack.org");
    return stash(u);
  }
  fun secure(): Int {
    val v = URL("https://phrack.org");
    return stash(v);
  }
  fun stash(q: Int): Int {
    return q;
  }
}
fun kmain(m: Int): Int {
  val f = KFetch();
  val r = f.insecure();
  return r + m;
}"""

F48_NET_SWIFT = """import Foundation;
class SFetch {
  let tag = 4;
  func insecure() -> Int {
    let u = URL("http://phrack.org");
    return stash(u);
  }
  func secure() -> Int {
    let v = URL("https://phrack.org");
    return stash(v);
  }
  func stash(_ q: Int) -> Int {
    return q;
  }
}
func smain(_ m: Int) -> Int {
  let f = SFetch();
  let r = f.insecure();
  return r + m;
}"""

F49_POOL_GO = """package main;
import (
  "net/http";
  "fmt";
);
type Worker struct {
  n int;
  tag string;
}
func (w Worker) run(v int) int {
  return v + w.n;
}
func fetch(u int) int {
  s := u + 2;
  fmt.Println(s);
  return s;
}
func gmain(m int) int {
  w := new(Worker);
  t := w.run(m);
  r := fetch(t);
  return r + t;
}"""

F50_FEED_RB = """require 'net/http'
class RFetch
  def initialize(tag)
    @tag = tag
  end
  def run(v)
    if v > 3
      return v + @tag
    else
      return v
    end
  end
end
def fetch(u)
  s = u + 2
  log(s)
  return s
end
f = RFetch.new(3)
t = f.run(5)
r = fetch(t)
q = Marshal.new(r)"""

F51_CLIENT_CS = """using System;
using System.Net;
namespace App {
  class CFetch {
    public int Tag { get; set; }
    private int stash(int q) {
      return q;
    }
    public int Insecure() {
      WebClient c = new WebClient();
      string u = c.Download("http://phrack.org");
      return stash(Tag);
    }
  }
  class Program {
    static int Main(int m) {
      CFetch f = new CFetch();
      int r = f.Insecure();
      Console.WriteLine(r);
      return r + m;
    }
  }
}"""

F45_INJECT_PHP = """<?php
require 'db_lib';
class Dao {
  public $conn;
  public function query($q) {
    echo $q, "run";
    return $this->conn;
  }
}
function handle($db) {
  $cmd = $_REQUEST['cmd'];
  $db->query($cmd);
  shell_exec($cmd);
}
function handle_safe($db2) {
  $lit = "safe";
  $db2->query($lit);
  shell_exec($lit);
}
?>"""

F27_SERVLET_JAVA = """class MyServlet {
  void doGet(HttpServletRequest req, HttpServletResponse resp) {
    String p = req.getParameter("q");
    PrintWriter w = resp.getWriter();
    w.println(p);
  }
  void doConst(HttpServletResponse resp) {
    PrintWriter w = resp.getWriter();
    w.println("hello");
  }
  void doLog(HttpServletRequest req, Logger log) {
    String p = req.getParameter("q");
    log.println(p);
  }
}"""

F28_TRUST_JAVA = """class NaiveTrust {
  boolean verify(String host, SSLSession session) {
    return true;
  }
  void checkServerTrusted(X509Certificate chain, String authType) {
    return;
  }
  boolean verifyStrict(String host, SSLSession session) {
    if (host == null) { return false; }
    return true;
  }
}"""

F24_NET_JAVA = """class NetClient {
  URL insecure() {
    URL u = new URL("http://phrack.org");
    return u;
  }
  URL secure() {
    URL u = new URL("https://phrack.org");
    return u;
  }
}"""

F25_GRADLE_BAD = """plugins {
    id 'com.android.application'
}
android {
    compileSdk 32
    defaultConfig {
        targetSdk 17
    }
}"""

F26_GRADLE_OK = """plugins {
    id 'com.android.application'
}
android {
    compileSdk 32
    defaultConfig {
        targetSdk 33
    }
}"""

F23_LENCHECK_C = """int read_field(char *buf, int buf_len) {
  int v = 0;
  if (buf_len > 4) { v = buf[4]; }
  return v;
}
int bad_field(char *pkt, int pkt_len) {
  int v = 0;
  if (pkt_len > 2) { v = pkt[8]; }
  return v;
}
int no_len(char *q) {
  int v = q[3];
  return v;
}
int zero_ok(char *npkt, int npkt_len) {
  int v = 0;
  if (npkt) { v = npkt[0]; }
  return v;
}"""

F21_VIEW_JSX = """function formatName(user) { return user; }
function getGreeting(user) {
  if (user) {
    return <h1 className={style} id="top">Hello, {formatName(user)}!</h1>;
  }
  return <h1>Hello, Stranger.</h1>;
}
const element = <div><h2>Good to see you here.</h2><br/></div>;
"""

F18_DISPATCH_JIMPLE = """public class JAnimal extends java.lang.Object {
  public int jnoise(int) {
    JAnimal r0;
    int i0;
    r0 := @this: JAnimal;
    i0 := @parameter0: int;
    return i0;
  }
}
public class JDog extends JAnimal {
  int jbark;

  public int jnoise(int) {
    JDog r0;
    int i0, i1;
    r0 := @this: JDog;
    i0 := @parameter0: int;
    i1 = r0.<JDog: int jbark>;
    i1 = i1 + i0;
    return i1;
  }
}
public class JKennel extends java.lang.Object {
  public static int jmain(int) {
    int i0, i1, i2;
    JAnimal r1;
    i0 := @parameter0: int;
    r1 = new JDog;
    specialinvoke r1.<JDog: void <init>()>();
    i1 = 0;
  jloop:
    if i0 <= 0 goto jdone;
    i2 = virtualinvoke r1.<JAnimal: int jnoise(int)>(i0);
    i1 = i1 + i2;
    i0 = i0 - 1;
    goto jloop;
  jdone:
    i1 = staticinvoke <JKennel: int jtally(int)>(i1);
    return i1;
  }
  public static int jtally(int) {
    int i0;
    i0 := @parameter0: int;
    lookupswitch(i0) { case 1: goto jone; default: goto jother; };
  jone:
    return 1;
  jother:
    return i0;
  }
}"""

F9_TRY_CPP = """int try1() { try { a; } catch (int x) { b; } }
int try3() {
  try { c; } catch (short u) { d; } catch (int v) { e; } catch (long w) { f; }
}
int tryf() { try { g; } catch (int x) { h; } finally { i; } }"""


def split_code_spans(text: str, n_spans: int = 3) -> list[dict]:
    """Split source text into n code spans at line boundaries (deterministic)."""
    lines = text.split("\n")
    n_spans = max(1, min(n_spans, len(lines)))
    per = (len(lines) + n_spans - 1) // n_spans
    spans = []
    for k in range(n_spans):
        chunk = "\n".join(lines[k * per:(k + 1) * per])
        if chunk or k == 0:
            spans.append({"kind": "code", "text": chunk, "media_ref": "",
                          "offset": len(spans)})
    return spans


def with_media(spans: list[dict], refs: list[str], positions: list[int]) -> list[dict]:
    """Interleave media spans at the given positions, renumbering offsets."""
    out: list[dict] = []
    ref_iter = iter(refs)
    for i, s in enumerate(spans):
        if i in positions:
            out.append({"kind": "media", "text": "", "media_ref": next(ref_iter),
                        "offset": 0})
        out.append(dict(s))
    while True:
        try:
            out.append({"kind": "media", "text": "", "media_ref": next(ref_iter),
                        "offset": 0})
        except StopIteration:
            break
    for i, s in enumerate(out):
        s["offset"] = i
    return out


F52_BSUM_ASM = """fn bsum @ 0x402000 params EDI ESI
0x402000: PUSH EBP
0x402004: MOV EBP, ESP
0x402008: XOR EAX, EAX
0x40200c: MOV ECX, EDI
0x402010: TEST ECX, ECX
0x402014: JLE 0x402028
0x402018: ADD EAX, [EBX + 8]
0x40201c: SUB ECX, 1
0x402020: CALL mix
0x402024: JMP 0x402010
0x402028: POP EBP
0x40202c: RET
endfn
fn mix @ 0x402030 params EAX
0x402030: LEA EDX, [EAX + 4]
0x402034: IMUL EAX, EDX
0x402038: CALL log
0x40203c: RFOO EAX
0x402040: RET
endfn"""


def fixture_docs() -> list[dict]:
    docs = [
        {"doc_id": "fixtures/c/flow", "spans": split_code_spans(F1_FLOW_C, 3)},
        {"doc_id": "fixtures/c/free_list", "spans": split_code_spans(F2_FREE_LIST_C, 2)},
        {"doc_id": "fixtures/c/test", "spans": split_code_spans(F3_TEST_C, 2)},
        {"doc_id": "fixtures/c/zoo", "spans": split_code_spans(F4_ZOO_C, 4)},
        {"doc_id": "fixtures/java/MethodTest.java", "spans": split_code_spans(F5_METHODTEST_JAVA, 3)},
        {"doc_id": "fixtures/java/Dispatch.java", "spans": split_code_spans(F6_DISPATCH_JAVA, 3)},
        # F8: F1 with interleaved media spans — parser output must be identical to F1
        {"doc_id": "fixtures/c/flow_media",
         "spans": with_media(split_code_spans(F1_FLOW_C, 3),
                             ["bin://blob-1", "bin://blob-2"], [1])},
        # F9: try/catch/finally fan-out (CfgCreationPassTests.scala:515-545)
        {"doc_id": "fixtures/c/try", "spans": split_code_spans(F9_TRY_CPP, 2)},
        # F10: function reference outside call position (MethodRefLinker)
        {"doc_id": "fixtures/c/fnptr", "spans": split_code_spans(F10_FNPTR_C, 1)},
        # F11: dynamic receiver resolvable only via recovered type hints
        {"doc_id": "fixtures/java/Hint.java", "spans": split_code_spans(F11_HINT_JAVA, 2)},
        # F12: fork-specific macro model (MACRO_DECL / MACRO_REF)
        {"doc_id": "fixtures/c/macro", "spans": split_code_spans(F12_MACRO_C, 2)},
        # F13: jssrc-mini — :program method, untyped receivers (naive/hint
        # linker workload), CHA over extends, require → IMPORT/DEPENDENCY
        {"doc_id": "fixtures/js/app.js", "spans": split_code_spans(F13_APP_JS, 3)},
        # F14: config doc → CONFIG_FILE node (XConfigFileCreationPass)
        {"doc_id": "fixtures/js/package.json",
         "spans": split_code_spans(F14_PACKAGE_JSON, 2)},
        # F15: pysrc-mini — <module> method, indentation blocks, constructor-
        # call type inference, class members, for-loop lowering
        {"doc_id": "fixtures/py/app.py", "spans": split_code_spans(F15_APP_PY, 4)},
        # F16: querydb scanner positives — dangerous functions, signed shift,
        # strlen truncation, credential drop, copy loop, use-after-free
        {"doc_id": "fixtures/c/scanners", "spans": split_code_spans(F16_SCANNERS_C, 5)},
        # F17: SQL-injection flow (handler param → query() param)
        {"doc_id": "fixtures/java/Injection.java",
         "spans": split_code_spans(F17_INJECTION_JAVA, 3)},
        # F18: jimple-mini (bytecode twin) — identity-stmt parameters, exact
        # typed invokes, CHA over the declared-class virtualinvoke, if-goto
        # loop, lookupswitch, instance field read, constructor stub
        {"doc_id": "fixtures/jimple/Dispatch.jimple",
         "spans": split_code_spans(F18_DISPATCH_JIMPLE, 4)},
        # F19: CryptographyMisuse positives/negatives — "MD5"/"SHA-1" literal
        # to MessageDigest.getInstance (direct and via local), low-iteration
        # PBEKeySpec constructor
        {"doc_id": "fixtures/java/Crypto.java",
         "spans": split_code_spans(F19_CRYPTO_JAVA, 3)},
        # F20: Metrics.scala positives/negatives — params/complexity/loops/
        # returns/nesting thresholds straddled one query at a time
        {"doc_id": "fixtures/c/metrics",
         "spans": split_code_spans(F20_METRICS_C, 3)},
        # F21: JSX → TEMPLATE_DOM (jssrc AstForTemplateDomCreator shapes:
        # element/opening/closing/attribute/text/expression-container)
        {"doc_id": "fixtures/js/view.jsx",
         "spans": split_code_spans(F21_VIEW_JSX, 2)},
        # F22: HeapBasedOverflow positives/negatives (CVE-2014-9626 shape) —
        # size-mismatch memcpy fires; matched size and non-arithmetic size
        # must not; malloc results are if-checked so RetvalChecks stays quiet
        {"doc_id": "fixtures/c/heap", "spans": split_code_spans(F22_HEAP_C, 2)},
        # F23: MissingLengthCheck positives/negatives — insufficient bound
        # fires; sufficient bound, no length field, and `if (arr)` zero-bound
        # on a zero offset must not
        {"doc_id": "fixtures/c/lencheck",
         "spans": split_code_spans(F23_LENCHECK_C, 2)},
        # F24: NetworkProtocols positives/negatives — http URL constructor
        # fires, https must not
        {"doc_id": "fixtures/java/Net.java",
         "spans": split_code_spans(F24_NET_JAVA, 2)},
        # F25/F26: fragment-injection — build.gradle configs straddling the
        # targetSdk 19 threshold (config docs: CONFIG_FILE node, no parse)
        {"doc_id": "fixtures/android/app/build.gradle",
         "spans": split_code_spans(F25_GRADLE_BAD, 1)},
        {"doc_id": "fixtures/android/lib/build.gradle",
         "spans": split_code_spans(F26_GRADLE_OK, 1)},
        # F27: xss-servlet — getParameter→println(writer) flow fires; a
        # constant println and a non-writer receiver must not
        {"doc_id": "fixtures/java/Servlet.java",
         "spans": split_code_spans(F27_SERVLET_JAVA, 2)},
        # F28: ineffective-certificate-check — trivially-true verify and
        # empty checkServerTrusted fire; the branching verifier must not
        {"doc_id": "fixtures/java/Trust.java",
         "spans": split_code_spans(F28_TRUST_JAVA, 2)},
        # F29: strncpy-no-null-term — same-size malloc/strncpy fires; +1
        # headroom and explicit zero-termination must not (malloc results
        # are if-checked so RetvalChecks stays quiet)
        {"doc_id": "fixtures/c/nullterm",
         "spans": split_code_spans(F29_NULLTERM_C, 2)},
        # F30: getenv-to-strcpy (ghidra pack) — getenv result into strcpy
        # source buffer fires; a literal source buffer must not
        {"doc_id": "fixtures/c/envcopy",
         "spans": split_code_spans(F30_GETENV_C, 2)},
        # F31: php pack shapes in the jssrc-mini — a _REQUEST subscript
        # flowing into a receiver-ful query() and into shell_exec() fires;
        # the constant twin must not
        {"doc_id": "fixtures/js/phpish.js",
         "spans": split_code_spans(F31_PHPISH_JS, 2)},
        # F32: root-detection-via-file-checks — /su literal reaching a called
        # isRooted's exists() fires; the caller-less twin must not
        {"doc_id": "fixtures/java/RootCheck.java",
         "spans": split_code_spans(F32_ROOT_JAVA, 2)},
        # F33/F34: manifest-backup-enabled — allowBackup true/false manifests
        {"doc_id": "fixtures/android/backup/AndroidManifest.xml",
         "spans": split_code_spans(F33_MANIFEST_BACKUP, 1)},
        {"doc_id": "fixtures/android/nobackup/AndroidManifest.xml",
         "spans": split_code_spans(F34_MANIFEST_OK, 1)},
        # F35: tap-jacking (targetSdk 21 < 23 fires; F26's 33 must not, and
        # 21 >= 19 keeps fragment-injection quiet) + vuln-prng minSdk 17
        {"doc_id": "fixtures/android/tap/build.gradle",
         "spans": split_code_spans(F35_GRADLE_TAP, 1)},
        # F36: vuln-prng code-side evidence — "SHA1PRNG" literal into
        # SecureRandom.getInstance
        {"doc_id": "fixtures/java/Rng.java",
         "spans": split_code_spans(F36_PRNG_JAVA, 1)},
        # F37: attack-app manifest — exported activity/receiver names,
        # cleartext traffic, external-storage permission (android pack gates)
        {"doc_id": "fixtures/android/attack/AndroidManifest.xml",
         "spans": split_code_spans(F37_MANIFEST_ATTACK, 1)},
        # F38: intent-to-runtime-exec — exported FwdActivity fires; the
        # unexported SafeActivity twin must not
        {"doc_id": "fixtures/java/FwdActivity.java",
         "spans": split_code_spans(F38_INTENT_JAVA, 2)},
        # F39: broadcast-to-file-write — exported EvilReceiver's onReceive
        # intent into a FileOutputStream write fires; unexported twin not
        {"doc_id": "fixtures/java/EvilReceiver.java",
         "spans": split_code_spans(F39_RECEIVER_JAVA, 2)},
        # F40: external-storage-to-dex-classloader — full chain fires; the
        # local-path loader twin must not
        {"doc_id": "fixtures/java/Dyn.java",
         "spans": split_code_spans(F40_DEX_JAVA, 2)},
        # F41: insecure-load-url-to-exec — http-loading host's @JavascriptInterface
        # bridge param into Runtime.exec fires; the https host's bridge not
        {"doc_id": "fixtures/java/WebHost.java",
         "spans": split_code_spans(F41_WEBVIEW_JAVA, 3)},
        # F42: unzip-directory-traversal — unchecked ZipEntry param into
        # FileOutputStream init fires; the startsWith-guarded twin must not
        {"doc_id": "fixtures/java/Unzip.java",
         "spans": split_code_spans(F42_UNZIP_JAVA, 2)},
        # F43: usage-of-nop-trust-manager — empty-check trust manager alloc
        # into SSLContext.init fires; the validating twin must not
        {"doc_id": "fixtures/java/Trustmgr.java",
         "spans": split_code_spans(F43_TRUSTMGR_JAVA, 2)},
        # F44: intent-redirection — unguarded startActivity forward fires;
        # the control-structure-guarded twin must not
        {"doc_id": "fixtures/java/Redirector.java",
         "spans": split_code_spans(F44_REDIRECT_JAVA, 2)},
        # F45: php-mini frontend — superglobal into a receiver-ful query()
        # and shell_exec() fires (php pack on real PHP); the literal twin
        # must not; echo/require/member/dynamic-dispatch shapes covered
        {"doc_id": "fixtures/php/inject.php",
         "spans": split_code_spans(F45_INJECT_PHP, 3)},
        # F46: UseAfterFree field queries — free'd param field that escapes
        # to the return fires (free-field-no-reassign); the all-paths
        # reassigner and the whole-struct-free twins must not. A local
        # stored into an out-param pointee then free'd fires
        # (free-returned-value); the different-local and reassigned-param
        # twins must not
        {"doc_id": "fixtures/c/uaf_field",
         "spans": split_code_spans(F46_UAF_FIELD_C, 3)},
        # F47: kotlin-mini frontend — new-less URL constructor with an
        # http: literal fires the kotlin pack's insecure-protocol query;
        # the https twin must not; typed params, val locals, constructor
        # CHA, and dotted imports covered
        {"doc_id": "fixtures/kotlin/Net.kt",
         "spans": split_code_spans(F47_NET_KT, 3)},
        # F48: swift-mini frontend — `-> Ret` clauses, `_ q: Int` label
        # pairs, let properties/locals, new-less constructor CHA; the
        # http: URL constructor fires insecure-protocol, the https twin
        # must not (same scanner anchor as the kotlin fixture)
        {"doc_id": "fixtures/swift/Net.swift",
         "spans": split_code_spans(F48_NET_SWIFT, 3)},
        # F49: go-mini frontend — receiver methods, `name Type` params,
        # := short declarations, new(T) alloc, struct MEMBERs, grouped
        # string imports
        {"doc_id": "fixtures/go/pool.go",
         "spans": split_code_spans(F49_POOL_GO, 3)},
        # F50: ruby-mini frontend — def/end blocks, X.new allocation
        # (same-file alloc vs external <init>), @ivar identifiers,
        # if/else/end, require dependency
        {"doc_id": "fixtures/ruby/feed.rb",
         "spans": split_code_spans(F50_FEED_RB, 3)},
        # F51: csharp-mini frontend — using directives, namespace block,
        # auto-property MEMBER, lower-case primitive types, static
        # Console dispatch
        {"doc_id": "fixtures/csharp/Client.cs",
         "spans": split_code_spans(F51_CLIENT_CS, 3)},
        # F52: ghidra-mini frontend (the binary-lifter twin) — register
        # parameters, callee-register argument injection, a TEST/JLE + JMP
        # loop through address JUMP_TARGETs, composite memory operand,
        # unknown mnemonic → UNKNOWN, internal + external CALLs; the lifted
        # binary itself rides along as the media span
        {"doc_id": "fixtures/asm/bsum.asm",
         "spans": with_media(split_code_spans(F52_BSUM_ASM, 3),
                             ["bin://f52-blob"], [1])},
    ]
    return docs


def skew_corpus(n_docs: int) -> "list[dict]":
    """F7: n copies of F3 with unique helper names, all calling printf/malloc.

    The hot keys (printf, malloc) land on every doc — at cluster scale this is
    the skewed build side of the call-linking join.
    """
    docs = []
    for k in range(n_docs):
        helper = f"helper_{k:07d}"
        src = (
            f"int main_{k:07d}() {{\n"
            f"  int a = {k % 97};\n"
            f"  int b = a + {k % 13};\n"
            f"  char *buf = malloc(b);\n"
            f"  {helper}(a, b);\n"
            f"  printf(buf);\n"
            f"  if (a > b) {{ a = b; }} else {{ b = a; }}\n"
            f"  while (a > 0) {{ a--; }}\n"
            f"  return b;\n"
            f"}}\n"
            f"void {helper}(int x, int y) {{\n"
            f"  int s = x + y;\n"
            f"  printf(s);\n"
            f"}}"
        )
        spans = split_code_spans(src, 3)
        if k % 5 == 0:
            spans = with_media(spans, [f"bin://skew-{k}"], [1])
        docs.append({"doc_id": f"skew/{k:07d}", "spans": spans})
    return docs


def docs_df(spark: SparkSession, docs: list[dict], partitions: int | None = None) -> DataFrame:
    rows = [(d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"])
                           for s in d["spans"]]) for d in docs]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    if partitions:
        df = df.repartition(partitions, "doc_id")
    return df


def fixture_docs_df(spark: SparkSession) -> DataFrame:
    return docs_df(spark, fixture_docs())
