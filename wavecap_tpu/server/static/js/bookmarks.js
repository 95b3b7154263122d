// Frequency bookmarks persisted in localStorage (reference frontend's
// BookmarkManager.react.tsx keeps the same client-side store).

const KEY = "wavecap.bookmarks";

export function listBookmarks() {
  try { return JSON.parse(localStorage.getItem(KEY)) || []; }
  catch { return []; }
}

function save(list) {
  localStorage.setItem(KEY, JSON.stringify(list));
}

export function addBookmark(mark) {
  const list = listBookmarks();
  if (list.some((b) => b.freqHz === mark.freqHz && b.mode === mark.mode)) return;
  list.push({ ...mark, added: Date.now() });
  list.sort((a, b) => a.freqHz - b.freqHz);
  save(list);
}

export function removeBookmark(mark) {
  save(listBookmarks().filter(
    (b) => !(b.freqHz === mark.freqHz && b.mode === mark.mode)));
}
